package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY §2.4): the reference has no join operator —
  * fan-in interleaves messages (reference: task/Subscriber.scala:43-52) and a
  * user would hand-roll a HashMap join inside a Task — so the engine supplies
  * Spark's watermark-bounded stream-stream join as the capability-parity op.
  * These specs pin the two load-bearing semantics: time-interval matching,
  * and outer-side null emission gated on the watermark (state cleanup). */
class StreamStreamJoinSpec extends SparkTestBase {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner stream-stream join matches within the event-time interval") {
    import spark.implicits._
    val clicks = GraftSource.memory[(String, Timestamp)](spark)
    val buys = GraftSource.memory[(String, Timestamp)](spark)
    val c = clicks.toDS().toDF("c_user", "c_ts").withWatermark("c_ts", "0 seconds")
    val b = buys.toDS().toDF("b_user", "b_ts").withWatermark("b_ts", "0 seconds")
    // purchase attributed to a click of the same user within the prior hour
    val joined = c.join(b,
      expr("c_user = b_user AND b_ts >= c_ts AND b_ts <= c_ts + interval 1 hour"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_inner").start()
    try {
      clicks.addData(("a", ts("2024-01-01 10:00:00")), ("b", ts("2024-01-01 10:00:00")))
      buys.addData(("a", ts("2024-01-01 10:30:00")), // in window -> match
        ("b", ts("2024-01-01 11:30:00"))) // 90min after click -> no match
      q.processAllAvailable()
      val got = spark.table("ssj_inner")
        .select($"c_user", $"b_ts".cast("string")).as[(String, String)].collect().toSet
      assert(got === Set(("a", "2024-01-01 10:30:00")))
    } finally q.stop()
  }

  test("left-outer join emits null match only after the watermark closes the window") {
    import spark.implicits._
    val clicks = GraftSource.memory[(String, Timestamp)](spark)
    val buys = GraftSource.memory[(String, Timestamp)](spark)
    val c = clicks.toDS().toDF("c_user", "c_ts").withWatermark("c_ts", "0 seconds")
    val b = buys.toDS().toDF("b_user", "b_ts").withWatermark("b_ts", "0 seconds")
    val joined = c.join(b,
      expr("c_user = b_user AND b_ts >= c_ts AND b_ts <= c_ts + interval 1 hour"),
      "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer").start()
    try {
      clicks.addData(("lonely", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // the join window [10:00, 11:00] is still open -> no output yet
      assert(spark.table("ssj_outer").count() === 0)
      // advance BOTH watermarks past 11:00 (global watermark = min of inputs)
      clicks.addData(("later", ts("2024-01-01 12:00:00")))
      buys.addData(("later2", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("ssj_outer")
        .select($"c_user", $"b_user").as[(String, Option[String])].collect().toSet
      assert(got.contains(("lonely", None)),
        s"expected lonely click to emit with null match, got $got")
    } finally q.stop()
  }
}
