package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase

/** Streaming replay dedup — the reference drops re-delivered messages on
  * replay with TimeStampFilter plus app-level keys
  * (reference: transaction/api/TimeStampFilter.scala:23-25, SURVEY §2.6);
  * Spark's primitive is dropDuplicatesWithinWatermark: duplicate keys are
  * suppressed as long as their state lives, and the watermark bounds how
  * long that is (so state doesn't grow forever — the 100 TB concern). */
class StreamingDedupSpec extends SparkTestBase {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("re-delivered events within the watermark are suppressed exactly-once-style") {
    import spark.implicits._
    val in = GraftSource.memory[(Long, Timestamp)](spark)
    val deduped = in.toDS().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      // at-least-once redelivery: same ids again (slightly different ts),
      // plus one genuinely new event
      in.addData((1L, ts("2024-01-01 10:00:01")), (2L, ts("2024-01-01 10:00:11")),
        (3L, ts("2024-01-01 10:00:20")))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids === Array(1L, 2L, 3L), s"each id exactly once, got ${ids.mkString(",")}")
    } finally q.stop()
  }
}
