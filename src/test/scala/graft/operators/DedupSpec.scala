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

  test("ngram-Jaccard df pruning loses no qualifying pair (vs unpruned brute force)") {
    import org.apache.spark.sql.functions._
    // unpruned reference: full inverted-index self-join, no df ceiling —
    // the round-2 formulation, kept here as the recall oracle for the cut
    val sh = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2])))")).as("s"))
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val brute = sh.select(col("doc_id").as("doc_a"), col("s"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), "s")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(cnt.toDF("doc_a", "na"), "doc_a")
      .join(cnt.toDF("doc_b", "nb"), "doc_b")
      .filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus should contain planted near-duplicates")
    assert(pairs(Dedup.ngramJaccard) == brute,
      "df-pruned candidate generation must find exactly the brute-force pairs")
  }
}
