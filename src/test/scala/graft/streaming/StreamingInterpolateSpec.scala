package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase

import scala.util.Random

/** Streaming interpolation == the batch formulation (ev_resample_interpolate
  * restricted to grid instants at or before each key's last observation —
  * the stream can never emit past data it has seen), bit-exact, for any
  * order-preserving chop. */
class StreamingInterpolateSpec extends SparkTestBase {

  private val StepMs = 10000L // 10 s grid

  private def withRocksDB[T](body: String => T): T = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body(Files.createTempDirectory("graft-it-ck").toString)
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def mkEvents(rng: Random): Seq[FfEvent] = {
    val base = 1700000000000L
    var t = base
    (0 until 60).map { i =>
      t += 1000L + rng.nextInt(15000)
      FfEvent(i.toLong, (i % 2).toLong, new java.sql.Timestamp(t),
        Some(rng.nextInt(100).toDouble))
    }
  }

  /** batch reference: per key, instants from ceil(first/step)*step through
    * the last observation; exact hits take the observation's value, the
    * rest interpolate between immediate neighbors with the identical JVM
    * op tree the processor uses. */
  private def batchInterp(evs: Seq[FfEvent]): Set[(Long, Long, Double)] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val start = (sorted.head.ts.getTime + StepMs - 1) / StepMs * StepMs
      val end = sorted.last.ts.getTime
      (start to end by StepMs).map { g =>
        val pi = sorted.lastIndexWhere(_.ts.getTime <= g)
        val prev = sorted(pi)
        val v =
          if (prev.ts.getTime == g) prev.v.get
          else {
            val next = sorted(pi + 1)
            val (t0, v0) = (prev.ts.getTime, prev.v.get)
            prev.v.get + (next.v.get - v0) *
              ((g - t0).toDouble / (next.ts.getTime - t0).toDouble)
          }
        (u, g, v)
      }
    }.toSet

  test("event-driven interpolation equals the batch formulation under randomized chopping") {
    import spark.implicits._
    val events = mkEvents(new Random(17))
    val expected = batchInterp(events)

    withRocksDB { ck =>
      val chopRng = new Random(501)
      val in = GraftSource.memory[FfEvent](spark)
      val withWm = in.toDS().withWatermark("ts", "0 seconds")
      val q = Interpolate.run(withWm, StepMs).writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("it_out").start()
      try {
        var rest = events
        while (rest.nonEmpty) {
          val k = 1 + chopRng.nextInt(math.min(10, rest.size))
          in.addData(rest.take(k))
          rest = rest.drop(k)
          q.processAllAvailable()
        }
        val got = spark.table("it_out").as[InterpOut].collect()
          .map(o => (o.user_id, o.grid_ms, o.v)).toSet
        assert(got === expected)
      } finally q.stop()
    }
  }

  test("null observations neither anchor nor emit; exact hits take the raw value") {
    import spark.implicits._
    def ev(id: Long, user: Long, ms: Long, v: Option[Double]) =
      FfEvent(id, user, new java.sql.Timestamp(ms), v)
    withRocksDB { ck =>
      val base = 1700000000000L // 10s-aligned
      val in = GraftSource.memory[FfEvent](spark)
      val withWm = in.toDS().withWatermark("ts", "0 seconds")
      val q = Interpolate.run(withWm, StepMs).writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("it_nulls").start()
      try {
        in.addData(Seq(
          ev(0, 1, base, Some(10.0)),          // exact hit at an instant
          ev(1, 1, base + 5000, None),         // null: must not anchor
          ev(2, 1, base + 20000, Some(30.0)))) // interp spans the null
        q.processAllAvailable()
        val got = spark.table("it_nulls").as[InterpOut].collect()
          .map(o => (o.grid_ms, o.v)).sortBy(_._1)
        // +10s interpolates base->+20s (frac 0.5), ignoring the null at +5s;
        // +20s is an exact hit
        assert(got === Seq((base, 10.0), (base + 10000, 20.0), (base + 20000, 30.0)))
      } finally q.stop()
    }
  }

  test("equal-timestamp runs resolve like the batch window: first anchors forward, last wins the instant") {
    import spark.implicits._
    def ev(id: Long, user: Long, ms: Long, v: Double) =
      FfEvent(id, user, new java.sql.Timestamp(ms), Some(v))
    withRocksDB { ck =>
      val base = 1700000000000L // 10s-aligned
      val in = GraftSource.memory[FfEvent](spark)
      val withWm = in.toDS().withWatermark("ts", "0 seconds")
      val q = Interpolate.run(withWm, StepMs).writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("it_dups").start()
      try {
        in.addData(Seq(
          ev(0, 1, base, 0.0),
          // duplicate run at +10s (grid-aligned): id order 1 then 2
          ev(1, 1, base + 10000, 20.0),
          ev(2, 1, base + 10000, 30.0),
          ev(3, 1, base + 25000, 80.0)))
        q.processAllAvailable()
        val got = spark.table("it_dups").as[InterpOut].collect()
          .map(o => (o.grid_ms, o.v)).sortBy(_._1)
        // the instant at +10s takes the run's LAST value (30, like the
        // batch window's event_id order); +20s interpolates from the run's
        // last (30 at +10s) toward 80 at +25s: 30 + 50 * (10/15)
        assert(got === Seq(
          (base, 0.0),
          (base + 10000, 30.0),
          (base + 20000, 30.0 + 50.0 * (10000.0 / 15000.0))))
      } finally q.stop()
    }
  }

  test("null-bounded keys: the grid spans valued observations only (documented batch divergence)") {
    import spark.implicits._
    def ev(id: Long, user: Long, ms: Long, v: Option[Double]) =
      FfEvent(id, user, new java.sql.Timestamp(ms), v)
    withRocksDB { ck =>
      val base = 1700000000000L // 10s-aligned
      val in = GraftSource.memory[FfEvent](spark)
      val withWm = in.toDS().withWatermark("ts", "0 seconds")
      val q = Interpolate.run(withWm, StepMs).writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("it_bounds").start()
      try {
        // earliest AND latest events are null-valued: the batch twin
        // (ev_resample_interpolate) bounds its grid by min/max over ALL
        // events, so it would emit null-'interp' rows at base..+10s and
        // 'hold' rows at +40s..+50s — the stream's grid is bounded by the
        // VALUED observations (+15s..+32s), so neither side ever appears
        // (Interpolate scaladoc "Parity SCOPE")
        in.addData(Seq(
          ev(0, 1, base, None),            // leading null: opens batch grid
          ev(1, 1, base + 15000, Some(10.0)),
          ev(2, 1, base + 32000, Some(44.0)),
          ev(3, 1, base + 50000, None)))   // trailing null: batch hold tail
        q.processAllAvailable()
        val got = spark.table("it_bounds").as[InterpOut].collect()
          .map(o => (o.grid_ms, o.v)).sortBy(_._1)
        // only the instants inside [first valued, last valued]: +20s, +30s
        assert(got === Seq(
          (base + 20000, 10.0 + 34.0 * (5000.0 / 17000.0)),
          (base + 30000, 10.0 + 34.0 * (15000.0 / 17000.0))))
      } finally q.stop()
    }
  }
}
