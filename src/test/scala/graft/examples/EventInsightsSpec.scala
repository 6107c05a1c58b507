package graft.examples

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The end-to-end event report on a planted trace with hand-computed
  * expectations for every frame, plus the native-streaming dashboard leg
  * under micro-batch chopping. */
class EventInsightsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  // u1 converts through the full funnel (first touch: ad), u2 stalls at
  // click (first touch: email), u3 only views; one planted outlier value
  private def trace() = Seq(
    (1L, 1L, ts(0), "ad", 1.0), (2L, 1L, ts(1), "view", 1.0),
    (3L, 1L, ts(2), "click", 1.0), (4L, 1L, ts(3), "purchase", 9.0),
    (5L, 2L, ts(0), "email", 1.0), (6L, 2L, ts(1), "view", 1.0),
    (7L, 2L, ts(2), "click", 1.0),
    (8L, 3L, ts(0), "view", 1.0),
    // same-type group with a wild outlier so anomalyZScore has a target;
    // 14 inliers: a single huge value inflates the group std itself (5
    // inliers left the outlier at z = 2.2 — masked), ~14 pin z ≈ 3.7
    (9L, 3L, ts(1), "metric", 1.0), (10L, 3L, ts(2), "metric", 1.1),
    (11L, 3L, ts(3), "metric", 0.9), (12L, 3L, ts(4), "metric", 1.05),
    (13L, 3L, ts(5), "metric", 0.95)) ++
    (20L to 28L).map(i => (i, 3L, ts(i.toInt - 10), "metric", 1.0)) ++
    Seq((14L, 3L, ts(30), "metric", 50.0))

  test("the assembled report matches hand-computed values on every frame") {
    import spark.implicits._
    val ev = trace().toDF("a", "b", "c", "d", "e")
    val r = EventInsights.analyze(ev, steps = ("view", "click", "purchase"),
      conversion = "purchase")

    // one session per user (all events inside one 30-min gap)
    assert(r.sessions.count() == 3L)

    // funnel: 3 viewed, 2 clicked after view, 1 purchased after click
    val funnel = r.funnel.collect().map(r0 => r0.getInt(0) -> r0.getLong(2)).toMap
    assert(funnel == Map(1 -> 3L, 2 -> 2L, 3 -> 1L), s"$funnel")

    // all users first-seen in the same week, no later activity weeks
    val ret = r.retention.collect()
      .map(r0 => (r0.getInt(1), r0.getLong(2)))
    assert(ret.toSeq == Seq((0, 3L)), s"${ret.toSeq}")

    // exactly the planted metric outlier flags (|z| > 3 in its group)
    val anom = r.anomalies.collect().map(_.getLong(0))
    assert(anom.toSeq == Seq(14L), s"${anom.toSeq}")

    // only u1 converted; its first touch was the ad
    val attr = r.attribution.collect()
      .map(r0 => r0.getString(0) -> r0.getLong(3)).toMap
    assert(attr == Map("ad" -> 1000000L), s"$attr")

    // alerts: u2's click is never answered by a purchase (abandonment);
    // u3's 16-event value series level-shifts at the planted 50.0
    val alerts = r.alerts.collect()
      .map(r0 => (r0.getString(0), r0.getLong(1))).toSet
    assert(alerts == Set(("abandoned_click", 2L), ("level_shift", 3L)),
      s"$alerts")
  }

  test("the live alert feed fires both families under chopped delivery") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // u2 clicks and never purchases (abandonment once the watermark
    // clears the 5-min deadline); u7's value series level-shifts hard
    // (quiet ~1.0 for 12 observations, then 100.0 — PH alarms at the
    // jump); u1 completes click->purchase inside the window (no alert)
    val quiet = (0 until 12).map(i => (100L + i, 7L, ts(i), "metric", 1.0))
    val shifted = (0 until 6).map(i => (200L + i, 7L, ts(12 + i), "metric", 100.0))
    val events: Seq[(Long, Long, Timestamp, String, Double)] =
      Seq((1L, 1L, ts(0), "click", 1.0), (2L, 1L, ts(2), "purchase", 1.0),
        (3L, 2L, ts(1), "click", 1.0)) ++ quiet ++ shifted ++
        // late ticks push the watermark far past u2's 6-min deadline
        Seq((300L, 9L, ts(60), "noise", 1.0), (301L, 9L, ts(90), "noise", 1.0))
    val src = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val feed = EventInsights.liveAlerts(
      src.toDF().toDF("id", "key", "at", "kind", "v")
        .withWatermark("at", "1 minute"),
      step2 = "click", step3 = "purchase", lambda = 20.0)
    val q = feed.writeStream.outputMode("append")
      .format("memory").queryName("ei_alerts").start()
    try {
      // chopped delivery: the timer-based abandonment path needs the
      // watermark to ADVANCE across batches, so deliver in several chops
      // (an extra empty pass lets pending event-time timers fire)
      val chopRng = new scala.util.Random(19)
      var rest = events
      while (rest.nonEmpty) {
        val k = 1 + chopRng.nextInt(6)
        src.addData(rest.take(k)); rest = rest.drop(k)
        q.processAllAvailable()
      }
      q.processAllAvailable()
      val got = spark.table("ei_alerts").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got.contains(("abandoned_click", "2")),
        s"u2's unanswered click must alert: $got")
      assert(got.contains(("level_shift", "7")),
        s"u7's planted jump must alarm: $got")
      assert(!got.exists(_._2 == "1"),
        s"u1 completed the funnel inside the window — no alert: $got")
      // the feed carries timestamps and diagnostics, not bare flags
      val lvl = spark.table("ei_alerts")
        .filter(col("alert") === "level_shift").head()
      assert(lvl.getTimestamp(2) != null && lvl.getString(3).startsWith("ph="))
    } finally q.stop()
    // bounded frames are a named contract error (their timer-proven
    // abandonments would silently vanish; analyze().alerts is the batch route)
    val e = intercept[IllegalArgumentException] {
      EventInsights.liveAlerts(
        events.toDF("id", "key", "at", "kind", "v"), "click", "purchase")
    }
    assert(e.getMessage.contains("streaming"), e.getMessage)
    // a string key is a named contract error, not a blind cast("long")
    // that nulls the key and kills the query at runtime (r17 review)
    val strSrc = MemoryStream[(Long, String, Timestamp, String, Double)]
    val eKey = intercept[IllegalArgumentException] {
      EventInsights.liveAlerts(
        strSrc.toDF().toDF("id", "key", "at", "kind", "v")
          .withWatermark("at", "1 minute"), "click", "purchase")
    }
    assert(eKey.getMessage.contains("integral"), eKey.getMessage)
  }

  test("the live leg matches the batch windowed counts after chopped delivery") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val batch = trace().map { case (_, _, t, k, v) => (k, t, v) }
    val expected = graft.api.EventAnalytics.windowedCounts(
      batch.toDF("k", "t", "v")).collect().map(_.toSeq).toSet
    val src = MemoryStream[(String, Timestamp, Double)]
    val q = EventInsights.live(src.toDF().toDF("k", "t", "v"), "ei_live")
    try {
      // deliver in two arbitrary chops; complete mode re-emits the table
      src.addData(batch.take(5)); q.processAllAvailable()
      src.addData(batch.drop(5)); q.processAllAvailable()
      val got = spark.table("ei_live").collect().map(_.toSeq).toSet
      assert(got == expected, s"stream $got vs batch $expected")
    } finally q.stop()
  }
}
