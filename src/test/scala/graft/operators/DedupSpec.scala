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

  test("exact-substring: boundary-straddling >=50-token spans are caught, 49-token spans are not, and the 10-token chunk grid misses them") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val S = (0 until 50).map(i => s"s$i") // the planted 50-token span
    // the span sits at UNALIGNED offsets 3 and 17 — different phases mod 10,
    // so no aligned 10-token chunk is common to both docs
    val a = ((0 until 3).map(i => s"a$i") ++ S ++ (0 until 10).map(i => s"ax$i")).mkString(" ")
    val b = ((0 until 17).map(i => s"b$i") ++ S ++ (0 until 5).map(i => s"bx$i")).mkString(" ")
    // one token short of the bar: must NOT be flagged
    val c = ((0 until 7).map(i => s"c$i") ++ S.take(49) ++ (0 until 12).map(i => s"cx$i")).mkString(" ")
    val d = (0 until 60).map(i => s"d$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")

    val v = Dedup.exactSubstringVerdicts(docs, Dedup.SubstrWindow)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // 63 tokens -> 14 stride-1 windows; exactly ONE (the span itself) is shared
    assert(v(1L) == ((14L, 1L, true)))
    assert(v(2L) == ((23L, 1L, true)))
    assert(v(3L) == ((19L, 0L, false)), "a 49-token span is below the bar")
    assert(v(4L) == ((11L, 0L, false)))

    // the gap exact-substring closes: dedup_chunk's aligned 10-token grid
    // finds NO shared chunk between docs 1 and 2 despite the 50-token span
    val grid = docs.filter(col("doc_id").isin(1L, 2L))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, cast(floor((size(w)-1)/10) as int)),
             c -> md5(concat_ws(' ', slice(w, c*10+1, 10))))""")).as("h"))
    val sharedChunks = grid.select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("n")).filter(col("n") >= 2).count()
    assert(sharedChunks == 0L,
      "straddling span must escape the aligned chunk grid (else this fixture proves nothing)")
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
