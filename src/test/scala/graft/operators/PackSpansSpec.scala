package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** pipeline_pack_spans must TILE: within each packed sequence the segments
  * cover [0, occupancy) with no gaps or overlaps; across sequences each
  * document's segments reassemble to exactly its token count with exactly
  * one head — the invariants a block-diagonal attention mask builder
  * relies on. */
class PackSpansSpec extends SparkTestBase {

  test("segments tile sequences and reassemble documents exactly") {
    val spans = Sampling.packSpans.run(spark, sf).cache()
    try {
      val rows = spans.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      assert(rows.nonEmpty)

      // per document: segments sum to n_tokens, exactly one head, and the
      // head is the segment on the lowest seq_id
      val docTok = graft.Tables.t(spark, sf, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.groupBy(_._2).foreach { case (doc, segs) =>
        assert(segs.map(_._4).sum == docTok(doc),
          s"doc $doc segments must sum to its ${docTok(doc)} tokens")
        assert(segs.count(_._5) == 1, s"doc $doc must have exactly one head")
        assert(segs.minBy(_._1)._5, s"doc $doc head must be its first segment")
      }

      // per sequence: sorted segments abut — each starts where the prior
      // ended, the first at 0; occupancy never exceeds the 512 budget
      rows.groupBy(_._1).foreach { case (seq, segs) =>
        val sorted = segs.sortBy(_._3)
        assert(sorted.head._3 == 0L, s"seq $seq must start at offset 0")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._3 + a._4 == b._3,
              s"seq $seq gap/overlap between $a and $b")
          case _ =>
        }
        val occ = sorted.last._3 + sorted.last._4
        assert(occ <= 512L, s"seq $seq occupancy $occ exceeds the budget")
      }

      // global: total segment tokens == total corpus tokens
      assert(rows.map(_._4).sum == docTok.values.sum)
    } finally spans.unpersist()
  }
}
