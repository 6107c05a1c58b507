package graft.api

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The public event facade on user-supplied frames (arbitrary column
  * names, events the fixture never shaped) with hand-computed planted
  * expectations — the "switch to this library" contract. */
class EventAnalyticsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("sessionize: 30-min gap splits a planted trace into exact sessions") {
    import spark.implicits._
    // user 1: events at 0, 10, 20 (one session), then 60, 65 (second);
    // user 2: single event
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(20), 4.0),
      (1L, ts(60), 8.0), (1L, ts(65), 16.0),
      (2L, ts(5), 32.0)).toDF("who", "when", "amount")
    val rows = EventAnalytics.sessionize(ev)
      .orderBy(col("user_id"), col("session_start"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1L, ts(0), 3L, 7.0), (1L, ts(60), 2L, 24.0), (2L, ts(5), 1L, 32.0)),
      s"${rows.toSeq}")
  }

  test("windowedCounts: tumbling hour buckets; sliding doubles coverage") {
    import spark.implicits._
    val ev = Seq(
      ("a", ts(10), 1.0), ("a", ts(50), 2.0), ("a", ts(70), 4.0),
      ("b", ts(10), 8.0)).toDF("k", "t", "v")
    val tumb = EventAnalytics.windowedCounts(ev).orderBy(col("w_start"), col("event_type"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(tumb.toSeq == Seq(
      (ts(0), "a", 2L, 3.0), (ts(0), "b", 1L, 8.0), (ts(60), "a", 1L, 4.0)),
      s"${tumb.toSeq}")
    // 30-min slide: each event lands in 2 windows
    val slid = EventAnalytics.windowedCounts(ev, "1 hour", "30 minutes")
    assert(slid.agg(sum(col("n"))).head().getLong(0) == 8L,
      "every event must land in exactly 2 sliding windows")
  }

  test("asOfJoin: latest right at-or-before; equal ts counts; no-prior rows drop") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), 100L),  // right at 5 -> asof 5
      (1L, ts(30), 101L),  // right at 30 (equal) -> asof 30
      (2L, ts(10), 102L))  // no right for key 2 -> dropped
      .toDF("k", "t", "id")
    val right = Seq((1L, ts(5)), (1L, ts(30)), (1L, ts(45))).toDF("k", "t")
    val rows = EventAnalytics.asOfJoin(left, right)
      .orderBy(col("lid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(3)))
    assert(rows.toSeq == Seq((100L, 1L, ts(5)), (101L, 1L, ts(30))),
      s"${rows.toSeq}")
  }

  test("funnel: first-step-before-last-step gate with exact counts") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "view", ts(5)), (1L, "buy", ts(10)), // converts
      (2L, "buy", ts(0)), (2L, "view", ts(5)),                       // buy first: no
      (3L, "view", ts(0))).toDF("u", "e", "t")                       // never buys
    val rows = EventAnalytics.funnel(ev, "view", "buy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 2L, 1L)), s"${rows.toSeq}")
  }

  test("input contracts fail loudly") {
    import spark.implicits._
    val two = Seq((1L, ts(0))).toDF("a", "b")
    intercept[IllegalArgumentException] { EventAnalytics.sessionize(two) }
    intercept[IllegalArgumentException] {
      EventAnalytics.asOfJoin(two, Seq((1L, ts(0), 1L)).toDF("a", "b", "c"))
    }
  }

  test("degenerate inputs: empty frames flow through; equal-ts right rows tie-break deterministically") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Timestamp, Double)].toDF("u", "t", "v")
    assert(EventAnalytics.sessionize(empty).count() == 0)
    assert(EventAnalytics.windowedCounts(
      Seq.empty[(String, Timestamp, Double)].toDF("k", "t", "v")).count() == 0)
    assert(EventAnalytics.funnel(
      Seq.empty[(Long, String, Timestamp)].toDF("u", "e", "t"), "a", "b").count() == 0)
    // duplicate right timestamps: the as-of pick is still the latest ts
    // (ties collapse to one value), never a row explosion
    val left = Seq((1L, ts(10), 7L)).toDF("k", "t", "id")
    val right = Seq((1L, ts(5)), (1L, ts(5)), (1L, ts(5))).toDF("k", "t")
    val rows = EventAnalytics.asOfJoin(left, right).collect()
    assert(rows.length == 1 && rows.head.getTimestamp(3) == ts(5), s"${rows.toSeq}")
  }

  test("windowedCounts runs natively on a stream (complete mode) and matches batch") {
    import spark.implicits._
    val data = Seq(("a", ts(10), 1.0), ("a", ts(50), 2.0), ("b", ts(70), 4.0))
    val truth = EventAnalytics.windowedCounts(data.toDF("k", "t", "v"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1.getTime, x._2))
    val in = graft.streaming.GraftSource.memory[(String, Timestamp, Double)](spark)
    val q = EventAnalytics.windowedCounts(in.toDS().toDF("k", "t", "v"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("ev_api_stream").start()
    try {
      in.addData(data: _*); q.processAllAvailable()
      val streamed = spark.table("ev_api_stream")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1.getTime, x._2))
      assert(streamed.sameElements(truth),
        s"stream ${streamed.toSeq} != batch ${truth.toSeq}")
    } finally q.stop()
  }
}
