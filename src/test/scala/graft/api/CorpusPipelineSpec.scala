package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The public pipeline facade must work on user-supplied (id, text) frames
  * with planted expectations: content-determined membership, hand-traced
  * packing/water-filling, loud failures on contract violations. */
class CorpusPipelineSpec extends SparkTestBase {

  private def corpus() = {
    import spark.implicits._
    (1L to 200L).map(i => (i, s"document body number $i with words " +
      ("w" * ((i % 7).toInt + 1)))).toDF("uid", "payload")
  }

  test("hashSample: content-determined, re-run stable, pct edges") {
    val df = corpus()
    val s1 = CorpusPipeline.hashSample(df, 10).collect().map(_.getLong(0)).sorted
    val s2 = CorpusPipeline.hashSample(df, 10).collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "re-runs must select the same documents")
    assert(CorpusPipeline.hashSample(df, 100).count() == 200L)
    assert(CorpusPipeline.hashSample(df, 0).count() == 0L)
    // membership is a function of CONTENT: same text under a different id
    // lands in the same bucket
    import spark.implicits._
    val twin = Seq((999L, "document body number 1 with words ww"))
      .toDF("uid", "payload")
    val b1 = CorpusPipeline.hashSample(df.limit(0).union(twin), 100)
      .collect().head.getLong(1)
    val b0 = CorpusPipeline.hashSample(df, 100)
      .filter(col("doc_id") === 1L).collect().head.getLong(1)
    assert(b1 == b0, "bucket must depend on text only")
    intercept[IllegalArgumentException] { CorpusPipeline.hashSample(df, 101) }
  }

  test("splitLabels: total cover, threshold-consistent, deterministic") {
    val df = corpus()
    val rows = CorpusPipeline.splitLabels(df).collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val (b, s) = (r.getLong(1), r.getString(2))
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == expect, s"bucket $b labeled $s")
    }
    val again = CorpusPipeline.splitLabels(df).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows.map(r => r.getLong(0) -> r.getString(2)).toMap == again)
  }

  test("decontaminate: planted 3-gram overlap, minShared gate") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("bid", "btxt")
    // doc 1 shares both bench 3-grams; doc 2 shares exactly one; doc 3 none
    val train = Seq(
      (1L, "intro alpha beta gamma delta outro"),
      (2L, "alpha beta gamma unrelated tail here"),
      (3L, "completely different text entirely")).toDF("tid", "ttxt")
    val strict = CorpusPipeline.decontaminate(train, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(strict.toSeq == Seq((1L, 100L, 2L)), s"${strict.toSeq}")
    val loose = CorpusPipeline.decontaminate(train, bench, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(loose.toSeq == Seq((1L, 100L, 2L), (2L, 100L, 1L)), s"${loose.toSeq}")
  }

  test("packSequences: hand-traced greedy packing at budget 6") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"),          // 3 tokens, start 0 -> seq 0 off 0
      (2L, "a b c d"),        // 4 tokens, start 3 -> seq 0 off 3
      (3L, "a b c d e")       // 5 tokens, start 7 -> seq 1 off 1
    ).toDF("id", "text")
    val rows = CorpusPipeline.packSequences(df, budget = 6)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 3, 0L, 0L), (2L, 4, 0L, 3L), (3L, 5, 1L, 1L)),
      s"${rows.toSeq}")
  }

  test("packSpans: boundary-straddling docs split into head + continuation segments that tile") {
    import spark.implicits._
    // same corpus as the packSequences trace at budget 6: doc 2 (start 3,
    // 4 tokens) straddles the 6-token boundary — a 3-token head suffix of
    // seq 0 and a 1-token continuation prefix of seq 1
    val df = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b c d e")).toDF("id", "text")
    val rows = CorpusPipeline.packSpans(df, budget = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      (0L, 1L, 0L, 3L, true), (0L, 2L, 3L, 3L, true),
      (1L, 2L, 0L, 1L, false), (1L, 3L, 1L, 5L, true)), s"${rows.toSeq}")
    // tiling invariants: per sequence, segments abut from 0 with no
    // overlap; per doc, segment lengths sum to its token count with
    // exactly one head segment
    rows.groupBy(_._1).foreach { case (seq, segs) =>
      val sorted = segs.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"seq $seq must start at offset 0")
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._3 + a._4 == b._3, s"seq $seq segments must abut") }
    }
    val perDoc = rows.groupBy(_._2)
    assert(perDoc(1L).map(_._4).sum == 3 && perDoc(2L).map(_._4).sum == 4 &&
      perDoc(3L).map(_._4).sum == 5, "segment lengths must sum to doc tokens")
    assert(perDoc.values.forall(_.count(_._5) == 1),
      "exactly one head segment per doc")
    intercept[IllegalArgumentException] {
      CorpusPipeline.packSpans(Seq(("x", "a")).toDF("id", "text"))
    }
    intercept[IllegalArgumentException] {
      CorpusPipeline.packSpans(df, budget = 0)
    }
  }

  test("shardAssign: full cover, contiguous positions, deterministic") {
    val df = corpus()
    val rows = CorpusPipeline.shardAssign(df, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 200 && rows.map(_._1).distinct.length == 200)
    assert(rows.map(_._2).forall(s => s >= 0 && s < 4))
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1 to rs.length),
        s"shard $shard positions must be 1..${rs.length}")
    }
    val again = CorpusPipeline.shardAssign(df, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(rows.sortBy(_._1).sameElements(again))
  }

  test("tokenBudget: hand-traced water level at half the total") {
    import spark.implicits._
    val groups = Seq(("a", 10L), ("b", 30L), ("c", 60L)).toDF("src", "n")
    val rows = CorpusPipeline.tokenBudget(groups).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(4))).toMap
    // total 100, budget 50: a keeps 10, water level 20 caps b and c
    assert(rows("a") == ((10L, 1.0)) && rows("b") == ((20L, 0.666666)) &&
      rows("c") == ((20L, 0.333333)), s"$rows")
    assert(rows.values.map(_._1).sum == 50L, "allocation must exhaust the budget")
  }
}
