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

  test("three-step sequence matches in order within the window, non-overlapping") {
    import spark.implicits._
    val in = GraftSource.memory[Cep.CepEvent](spark)
    val matches = Cep.detectSequence(
      in.toDS().withWatermark("ts", "10 seconds").as[Cep.CepEvent],
      steps = Seq("view", "click", "purchase"), withinMs = 600000L)
    val q = matches.writeStream.outputMode("append")
      .format("memory").queryName("cep_seq").start()
    try {
      // full chain with noise between steps, delivered out of order
      in.addData(
        CepEvent("a", "click", ts("2024-01-01 10:02:00")),
        CepEvent("a", "view", ts("2024-01-01 10:00:00")),
        CepEvent("a", "scroll", ts("2024-01-01 10:01:00")),
        CepEvent("a", "purchase", ts("2024-01-01 10:05:00")),
        // b: chain whose last step falls OUTSIDE the 10-minute window
        CepEvent("b", "view", ts("2024-01-01 10:00:00")),
        CepEvent("b", "click", ts("2024-01-01 10:01:00")),
        CepEvent("b", "purchase", ts("2024-01-01 10:20:00")),
        // c: steps out of order (click before view) — no match
        CepEvent("c", "click", ts("2024-01-01 10:00:00")),
        CepEvent("c", "purchase", ts("2024-01-01 10:01:00")),
        CepEvent("c", "view", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val got = spark.table("cep_seq").as[Cep.SeqMatch].collect().toSet
      assert(got === Set(Cep.SeqMatch("a", ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:05:00"))))
    } finally q.stop()
  }

  test("absence alert fires from the event-time timer when no answer arrives") {
    import spark.implicits._
    val in = GraftSource.memory[Cep.CepEvent](spark)
    val alerts = Cep.detectAbsence(
      in.toDS().withWatermark("ts", "0 seconds").as[Cep.CepEvent],
      first = "order", second = "payment", withinMs = 300000L)
    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("cep_abs").start()
    try {
      in.addData(
        CepEvent("paid", "order", ts("2024-01-01 10:00:00")),
        CepEvent("paid", "payment", ts("2024-01-01 10:02:00")),
        CepEvent("ghost", "order", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("cep_abs").count() === 0) // nothing provable yet
      // push the watermark past ghost's 10:05 deadline: the TIMER emits
      in.addData(CepEvent("z", "order", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      in.addData(CepEvent("z", "payment", ts("2024-01-01 11:01:00")))
      q.processAllAvailable()
      val got = spark.table("cep_abs").as[Cep.AbsenceAlert].collect().toSet
      assert(got === Set(Cep.AbsenceAlert("ghost", ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:05:00"))))

      // in-stream proof path: a late unrelated event past the deadline
      // emits the alert without waiting for the watermark
      in.addData(
        CepEvent("slow", "order", ts("2024-01-01 12:00:00")),
        CepEvent("slow", "ping", ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val got2 = spark.table("cep_abs").as[Cep.AbsenceAlert].collect().toSet
      assert(got2.contains(Cep.AbsenceAlert("slow", ts("2024-01-01 12:00:00"),
        ts("2024-01-01 12:05:00"))))
    } finally q.stop()
  }
}
