package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The property that justifies content-defined chunking's existence over
  * the fixed grid: a single-token INSERTION leaves most CDC chunk digests
  * intact (boundaries re-synchronize right after the edit), while the
  * 10-token grid shifts every downstream chunk. The oracle can't see this
  * — it only checks the profile on the real corpus — so pin it on a
  * planted pair here. */
class CdcChunkSpec extends SparkTestBase {

  // ~200 deterministic pseudo-words: long enough for many CDC boundaries
  private val base: Seq[String] =
    (0 until 200).map(i => s"w${(i * 2654435761L % 997)}")

  test("one-token insertion: CDC still matches most chunks, the fixed grid matches none") {
    import spark.implicits._
    val a = base.mkString(" ")
    val b = ("INSERTED" +: base).mkString(" ") // shift every token by one
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")

    val cdc = Dedup.cdcChunkProfile(docs)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (na, da) = cdc(1L)
    assert(na >= 5, s"expected several CDC chunks on 200 tokens, got $na")
    assert(da * 2 >= na,
      s"CDC must re-sync after the insertion: only $da of $na chunks matched")

    // the fixed 10-token grid on the same pair: every chunk of doc 2 is
    // shifted by one token, so no digest can match doc 1's
    val grid = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, cast(floor((size(w)-1)/10) as int)),
             c -> md5(concat_ws(' ', slice(w, c*10+1, 10))))""")).as("h"))
    val gridShared = grid.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).count()
    assert(gridShared == 0L,
      s"the fixed grid should share zero chunks across the shifted pair, got $gridShared")
  }

  test("identical documents: every CDC chunk is a duplicate; disjoint documents: none") {
    import spark.implicits._
    val a = base.mkString(" ")
    val c = (0 until 200).map(i => s"z${i}q").mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text")
    val prof = Dedup.cdcChunkProfile(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof(1L)._1 == prof(1L)._2, "twin A: all chunks duplicated")
    assert(prof(2L)._1 == prof(2L)._2, "twin B: all chunks duplicated")
    assert(prof(3L)._2 == 0L, "disjoint doc shares nothing")
  }
}
