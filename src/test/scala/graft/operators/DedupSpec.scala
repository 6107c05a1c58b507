package graft.operators

import graft.SparkTestBase

/** Cross-checks between dedup variants: the fast xxhash64 MinHash has no
  * DuckDB oracle, so its correctness gate is agreement with the md5-oracled
  * variant on which document pairs are near-duplicates. Signatures differ
  * (different hash family) but both estimate the same Jaccard, and on this
  * corpus the planted near-dups are far from the 0.5 threshold, so the pair
  * sets must coincide. */
class DedupSpec extends SparkTestBase {

  private def pairs(q: graft.GraftQuery): Set[(Long, Long)] =
    q.run(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("both minhash variants recall every true high-Jaccard pair") {
    // est-Jaccard >= 0.5 over 16 hashes, 8x2 banding: a pair with exact
    // J >= 0.8 escapes all bands with p ~ 3e-4 — and the hashes are fixed,
    // so this is a deterministic property of corpus + hash family, not luck.
    val jac = pairs(Dedup.ngramJaccard)
    assert(jac.nonEmpty, "corpus should contain planted near-duplicates")
    val slow = pairs(Dedup.minhashLsh)
    val fast = pairs(Dedup.minhashFast)
    assert(jac.subsetOf(slow), s"md5 variant missed: ${jac.diff(slow)}")
    assert(jac.subsetOf(fast), s"xxhash64 variant missed: ${jac.diff(fast)}")
    // the variants may legitimately differ only on borderline (est ~0.5)
    // pairs below the exact-0.8 bar; cap that disagreement.
    assert((fast.diff(slow) ++ slow.diff(fast)).size <= slow.size / 2)
  }
}
