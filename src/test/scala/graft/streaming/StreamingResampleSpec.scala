package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase

import scala.util.Random

/** Streaming resample == batch resample: the timer-driven grid rows must
  * equal the batch formulation (ev_resample_grid's grid/event union +
  * LOCF window) on the same events, for any order-preserving chop — and
  * grid points past the last event of a batch must flow once the
  * watermark passes them, without waiting for more data on that key. */
class StreamingResampleSpec extends SparkTestBase {

  private val StepMs = 10000L // 10 s grid

  private def withRocksDB[T](body: String => T): T = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body(Files.createTempDirectory("graft-rs-ck").toString)
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def mkEvents(rng: Random): Seq[FfEvent] = {
    val base = 1700000000000L
    var t = base
    (0 until 50).map { i =>
      t += 1000L + rng.nextInt(15000)
      val v = if (rng.nextDouble() < 0.3) None else Some(rng.nextInt(100).toDouble)
      FfEvent(i.toLong, (i % 2).toLong, new java.sql.Timestamp(t), v)
    }
  }

  /** batch reference: per user, grid from ceil(first/step)*step through the
    * FINAL WATERMARK (the max event ts across ALL users with 0s delay),
    * LOCF carry at each instant, events at an instant applying first. */
  private def batchGrid(evs: Seq[FfEvent]): Set[(Long, Long, Option[Double])] = {
    val wm = evs.map(_.ts.getTime).max
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val start = (sorted.head.ts.getTime + StepMs - 1) / StepMs * StepMs
      var carry: Option[Double] = None
      var i = 0
      (start to wm by StepMs).map { g =>
        while (i < sorted.length && sorted(i).ts.getTime <= g) {
          carry = sorted(i).v.orElse(carry); i += 1
        }
        (u, g, carry)
      }
    }.toSet
  }

  test("timer-driven grid equals the batch formulation under randomized chopping") {
    import spark.implicits._
    val events = mkEvents(new Random(11))
    val expected = batchGrid(events)

    withRocksDB { ck =>
      val chopRng = new Random(300)
      val in = GraftSource.memory[FfEvent](spark)
      val withWm = in.toDS().withWatermark("ts", "0 seconds")
      val q = Resample.run(withWm, StepMs).writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("rs_out").start()
      try {
        var rest = events
        while (rest.nonEmpty) {
          val k = 1 + chopRng.nextInt(math.min(10, rest.size))
          in.addData(rest.take(k))
          rest = rest.drop(k)
          q.processAllAvailable()
        }
        val got = spark.table("rs_out").as[GridOut].collect()
          .map(o => (o.user_id, o.grid_ms, o.v)).toSet
        // the stream may still hold grid points between the last PER-KEY
        // event and the final watermark un-released if no trailing batch
        // ran; processAllAvailable after the last add runs the timer batch,
        // so everything up to the final watermark must be out
        assert(got === expected)
      } finally q.stop()
    }
  }

  test("an idle key keeps emitting grid points as the watermark advances") {
    import spark.implicits._
    def ev(id: Long, user: Long, ms: Long, v: Option[Double]) =
      FfEvent(id, user, new java.sql.Timestamp(ms), v)
    withRocksDB { ck =>
      val base = 1700000000000L
      val in = GraftSource.memory[FfEvent](spark)
      val withWm = in.toDS().withWatermark("ts", "0 seconds")
      val q = Resample.run(withWm, StepMs).writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("rs_idle").start()
      try {
        // user 1 speaks once; user 2's later events push the watermark
        in.addData(Seq(ev(0, 1, base + 1000, Some(7.0))))
        q.processAllAvailable()
        in.addData(Seq(ev(1, 2, base + 35000, Some(1.0))))
        q.processAllAvailable()
        val got = spark.table("rs_idle").as[GridOut].collect()
          .filter(_.user_id == 1).map(o => (o.grid_ms, o.v)).sortBy(_._1)
        // watermark reached base+35000: user 1's grid at +10s, +20s, +30s
        // all emitted with the carried 7.0 — no new user-1 data needed
        assert(got === Seq((base + 10000, Some(7.0)), (base + 20000, Some(7.0)),
          (base + 30000, Some(7.0))))
      } finally q.stop()
    }
  }
}
