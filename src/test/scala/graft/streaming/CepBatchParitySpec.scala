package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The batch CEP query (ev_cep_pairs, window-function formulation) and the
  * streaming detector (Cep.detect, stateful fold) must report the SAME
  * click->purchase pairs on the same rows — the kappa guarantee for CEP.
  * Premise checked first: the corpus has no same-timestamp click/purchase
  * per user (the only case where the streaming fold's tie order could
  * diverge from the batch RANGE frame's strict ordering). */
class CepBatchParitySpec extends SparkTestBase {

  test("streaming detector equals the batch window-function query on the events corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("string").as("key"),
        col("event_type").as("etype"), col("ts"))

    // premise: no (user, ts) carries both a click and a purchase
    val collisions = ev.groupBy(col("key"), col("ts"))
      .agg(countDistinct(col("etype")).as("n"))
      .filter(col("n") > 1).count()
    assert(collisions === 0, "corpus premise: no same-ts click/purchase ties")

    val batch = graft.operators.EventOps.cepPairs.run(spark, dir)
      .select(col("user_id").cast("string"), col("first_ts"), col("second_ts"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet

    val in = GraftSource.memory[Cep.CepEvent](spark)
    val q = Cep.detect(in.toDS().withWatermark("ts", "1 hour"),
        first = "click", second = "purchase", withinMs = 300000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_parity").start()
    try {
      val rows = ev.as[Cep.CepEvent].collect().sortBy(_.ts.getTime)
      // feed in two event-time-ordered chunks (cross-batch state carry)
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toSeq); q.processAllAvailable()
      in.addData(b.toSeq); q.processAllAvailable()
      val streamed = spark.table("cep_parity").as[Cep.PatternMatch]
        .collect().map(m => (m.key, m.firstTs, m.secondTs)).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
