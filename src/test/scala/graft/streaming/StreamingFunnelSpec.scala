package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming funnel tracker == batch ev_funnel: the last emitted row per
  * user must carry exactly the (n_clicks, n_purchases, converted) the
  * batch min/max reduction computes on the same events, for ANY chop and
  * ANY arrival order (min/max/count are commutative). The sf0.001 trial
  * pins the tracker against the registry query itself. */
class StreamingFunnelSpec extends SparkTestBase {

  private def lastPerUser(rows: Array[FunnelOut]): Map[Long, (Long, Long, Boolean)] =
    rows.groupBy(_.user_id).map { case (u, rs) =>
      // n_clicks + n_purchases only grows: the max-sum row is the latest
      val last = rs.maxBy(r => r.n_clicks + r.n_purchases)
      u -> ((last.n_clicks, last.n_purchases, last.converted))
    }

  test("stream equals the batch reduction under randomized chopping AND shuffling") {
    import spark.implicits._
    val rng = new Random(7)
    val types = Seq("click", "purchase", "view", "error")
    val events = (0 until 400).map { i =>
      FunnelEvent((i % 11).toLong,
        1700000000000000L + rng.nextInt(1 << 30).toLong,
        types(rng.nextInt(types.size)))
    }
    val expected = events.groupBy(_.user_id).map { case (u, es) =>
      val clicks = es.filter(_.event_type == "click")
      val purchases = es.filter(_.event_type == "purchase")
      val converted = clicks.nonEmpty && purchases.nonEmpty &&
        clicks.map(_.us).min < purchases.map(_.us).max
      u -> ((clicks.size.toLong, purchases.size.toLong, converted))
    }
    for (trial <- 0 until 3) {
      val chopRng = new Random(60 + trial)
      val arrival = chopRng.shuffle(events)
      val in = GraftSource.memory[FunnelEvent](spark)
      val q = FunnelTracker.run(in.toDS()).writeStream.outputMode("append")
        .format("memory").queryName(s"funnel_out_$trial").start()
      try {
        var rest = arrival
        while (rest.nonEmpty) {
          val k = 1 + chopRng.nextInt(math.min(50, rest.size))
          in.addData(rest.take(k))
          rest = rest.drop(k)
          q.processAllAvailable()
        }
        val got = lastPerUser(spark.table(s"funnel_out_$trial").as[FunnelOut].collect())
        assert(got === expected, s"trial $trial diverged from the batch reduction")
      } finally q.stop()
    }
  }

  test("tracker reproduces the registry ev_funnel rows at sf0.001") {
    import spark.implicits._
    val events = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .as[FunnelEvent].collect().toSeq
    val in = GraftSource.memory[FunnelEvent](spark)
    val q = FunnelTracker.run(in.toDS()).writeStream.outputMode("append")
      .format("memory").queryName("funnel_reg").start()
    try {
      val chopRng = new Random(42)
      var rest = chopRng.shuffle(events)
      while (rest.nonEmpty) {
        val k = 1 + chopRng.nextInt(math.min(200, rest.size))
        in.addData(rest.take(k))
        rest = rest.drop(k)
        q.processAllAvailable()
      }
      val got = lastPerUser(spark.table("funnel_reg").as[FunnelOut].collect())
        .collect { case (u, (nc, np, true)) => (u, nc, np) }.toSet
      val want = graft.SparkEntry.queries("ev_funnel")(spark, sf)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, "streaming converted set must equal the batch funnel")
    } finally q.stop()
  }
}
