package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Event-time windows + watermark semantics — the Spark counterpart of the
  * reference's min-clock/window machinery (SURVEY §2.6, §2.9): windows emit
  * once the watermark passes their end; data later than the watermark is
  * dropped (the explicit allowed-lateness bound the reference leaves to
  * checkpoint retention). */
class WatermarkWindowSpec extends SparkTestBase {
  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("tumbling window emits on watermark passage and drops too-late data") {
    import spark.implicits._
    val in = GraftSource.memory[(Timestamp, Double)](spark)
    val agg = in.toDS().toDF("ts", "v")
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .select(col("window.start").cast("long").as("w"), col("n"), col("s"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      // batch 1: two events in [0,10), one in [10,20) -> wm becomes 12-5=7, nothing closes
      in.addData((ts(1), 1.0), (ts(5), 2.0), (ts(12), 10.0))
      q.processAllAvailable()
      assert(spark.table("wm_out").count() === 0)

      // batch 2: event at 30 -> wm 25 -> windows [0,10) and [10,20) close
      in.addData((ts(30), 5.0))
      q.processAllAvailable()
      val closed = spark.table("wm_out").as[(Long, Long, Double)].collect().sortBy(_._1)
      assert(closed === Array((0L, 2L, 3.0), (10L, 1L, 10.0)))

      // batch 3: late event at t=2, far behind wm=25 -> dropped, no change
      in.addData((ts(2), 99.0))
      q.processAllAvailable()
      assert(spark.table("wm_out").count() === 2)
    } finally q.stop()
  }

  test("sliding window credits each event to size/step windows") {
    import spark.implicits._
    val in = GraftSource.memory[(Timestamp, Double)](spark)
    val agg = in.toDS().toDF("ts", "v")
      .groupBy(window(col("ts"), "10 seconds", "5 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w"), col("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("slide_out").start()
    try {
      in.addData((ts(7), 1.0)) // belongs to [0,10) and [5,15)
      q.processAllAvailable()
      val got = spark.table("slide_out").as[(Long, Long)].collect().sortBy(_._1)
      assert(got === Array((0L, 1L), (5L, 1L)))
    } finally q.stop()
  }

  test("session window merges events within gap, splits beyond it") {
    import spark.implicits._
    val in = GraftSource.memory[(Timestamp, String)](spark)
    val agg = in.toDS().toDF("ts", "u")
      .groupBy(session_window(col("ts"), "10 seconds").as("w"), col("u"))
      .agg(count(lit(1)).as("n"))
      .select(col("u"), col("w.start").cast("long").as("s"), col("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    try {
      in.addData((ts(1), "a"), (ts(8), "a"), (ts(30), "a"), (ts(3), "b"))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got === Array(("a", 1L, 2L), ("a", 30L, 1L), ("b", 3L, 1L)))
    } finally q.stop()
  }
}
