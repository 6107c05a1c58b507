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
