package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.streaming.Cep.{CepEvent, PatternMatch}

/** CEP pattern detection: first-then-second within a bound, per key, with
  * event-time state GC. Covers in-batch disorder (arrival order reversed
  * from event time), the no-first guard, repeated matches against one
  * `first`, and state expiry past the watermark. */
class CepSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("detects click->purchase within 5 minutes, sorting each batch by event time") {
    import spark.implicits._
    val in = GraftSource.memory[CepEvent](spark)
    val matches = Cep.detect(
      in.toDS().withWatermark("ts", "10 seconds").as[CepEvent],
      first = "click", second = "purchase", withinMs = 300000L)
    val q = matches.writeStream.outputMode("append")
      .format("memory").queryName("cep_out").start()
    try {
      // arrival order purchase-before-click, event order click-before-purchase:
      // the fold must sort by event time to see the match.
      in.addData(
        CepEvent("a", "purchase", ts("2024-01-01 10:00:30")),
        CepEvent("a", "click", ts("2024-01-01 10:00:00")),
        CepEvent("b", "purchase", ts("2024-01-01 10:00:05"))) // no click: no match
      q.processAllAvailable()
      val got1 = spark.table("cep_out").as[PatternMatch].collect().toSet
      assert(got1 === Set(PatternMatch("a", ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:00:30"), 30000L)))

      // a second purchase within the window of the SAME click still matches
      in.addData(CepEvent("a", "purchase", ts("2024-01-01 10:04:00")))
      q.processAllAvailable()
      val got2 = spark.table("cep_out").as[PatternMatch].collect().toSet
      assert(got2.contains(PatternMatch("a", ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:04:00"), 240000L)))

      // push the watermark far past click+5m: state must be GC'd, so a
      // later purchase alone finds nothing
      in.addData(CepEvent("z", "click", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData(CepEvent("a", "purchase", ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      val got3 = spark.table("cep_out").as[PatternMatch].collect()
      assert(got3.length === 2, s"expired click must not match, got ${got3.toList}")

      // gap == 0 (same timestamp) is NOT first-then-second
      in.addData(
        CepEvent("c", "click", ts("2024-01-01 12:30:00")),
        CepEvent("c", "purchase", ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      assert(spark.table("cep_out").count() === 2)
    } finally q.stop()
  }
}
