package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Stream == batch for the MMR retrieval twin: the incrementally-maintained
  * shortlist must converge to the batch shortlist under ANY micro-batch
  * chopping (top-k by a total order is an associative merge), and the MMR
  * selection on top is shared code with the batch operator — so the final
  * streamed selection must equal ann_mmr_topk's rows exactly. Replays must
  * be no-ops (at-least-once safety). */
class StreamingMmrSpec extends SparkTestBase {

  private def corpus(): Seq[(Long, Seq[Float])] =
    graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      .sortBy(_._1).toSeq

  private def selRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("q_id"), col("pick"), col("vec_id"), col("rel"), col("score"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq

  test("streamed MMR selection over chopped corpus equals the batch operator; replay is a no-op") {
    import spark.implicits._
    val vs = corpus()
    val truth = selRows(graft.operators.Similarity.annMmrTopK.run(spark, sf))
    assert(truth.size == 8 * 5, "batch MMR must pick 5 per query")

    val queries = vs.filter(_._1 < 8).toDF("q_id", "q_emb")
    val tracker = new StreamingMmrTracker(spark, queries)
    val in = GraftSource.memory[(Long, Seq[Float])](spark)
    val q = tracker.stream(in.toDS().toDF("vec_id", "embedding"))
    try {
      // adversarial chopping: uneven chunks, including a 1-row batch
      val chunks = Seq(vs.take(1), vs.slice(1, 180), vs.slice(180, 181),
        vs.drop(181))
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      val streamed = selRows(tracker.selection())
      assert(streamed == truth,
        s"stream != batch\nstream: ${streamed.take(6)}\nbatch:  ${truth.take(6)}")

      // at-least-once: replaying an entire chunk changes nothing
      in.addData(chunks(1)); q.processAllAvailable()
      assert(selRows(tracker.selection()) == truth,
        "a replayed micro-batch must fold in idempotently")
    } finally q.stop()
  }

  test("a different chopping yields the identical selection (order-insensitivity)") {
    import spark.implicits._
    val vs = corpus()
    val queries = vs.filter(_._1 < 8).toDF("q_id", "q_emb")
    // reference run: one giant batch
    val t1 = new StreamingMmrTracker(spark, queries)
    t1.update(vs.toDF("vec_id", "embedding"))
    val oneShot = selRows(t1.selection())
    // reversed per-element feed in 7 chunks
    val t2 = new StreamingMmrTracker(spark, queries)
    vs.reverse.grouped((vs.size + 6) / 7)
      .foreach(c => t2.update(c.toDF("vec_id", "embedding")))
    assert(selRows(t2.selection()) == oneShot)
  }

  test("excludeSelf=false keeps corpus vectors whose ids collide with query ids") {
    import spark.implicits._
    // disjoint USER id spaces that happen to collide numerically:
    // query 3 and corpus vector 3 are different objects
    val queries = Seq((3L, Seq(1f, 0f))).toDF("q_id", "q_emb")
    val batch = Seq(
      (3L, Seq(1f, 0f)),   // id-collides with the query; must still rank
      (7L, Seq(0.6f, 0.8f))).toDF("vec_id", "embedding")

    val incl = new StreamingMmrTracker(spark, queries, excludeSelf = false)
    incl.update(batch)
    val inclIds = selRows(incl.selection()).map(_._3).toSet
    assert(inclIds == Set(3L, 7L),
      s"excludeSelf=false must keep the colliding id: $inclIds")

    val excl = new StreamingMmrTracker(spark, queries) // default: batch twin
    excl.update(batch)
    val exclIds = selRows(excl.selection()).map(_._3).toSet
    assert(exclIds == Set(7L),
      s"default self-exclusion must drop vec_id == q_id: $exclIds")
  }
}
