package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming SCD2 == batch SCD2: the sealed intervals the tracker emits
  * must equal the batch query's closed intervals (valid_to IS NOT NULL)
  * for ANY randomized chop of the stream and ANY within-day arrival
  * shuffle. A day can only finalize when a later day arrives, so each
  * feed ends with one day-advancing flush sentinel per user (the
  * heartbeat a real deployment uses); the sentinel day itself never
  * finalizes, so its payload is irrelevant and no spurious interval can
  * come from it. */
class Scd2TrackerSpec extends SparkTestBase {

  private def withRocksDB[T](body: String => T): T = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body(Files.createTempDirectory("graft-scd2-ck").toString)
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** Feed events day-ordered (within-day shuffled), in random chops, then
    * the flush sentinels; return the sealed intervals. */
  private def drive(events: Seq[Scd2Event], chopRng: Random, name: String): Set[(Long, String, Int, Int)] =
    withRocksDB { ck =>
      import spark.implicits._
      val maxDay = events.map(_.day).max
      val sentinels = events.map(_.user_id).distinct
        .map(u => Scd2Event(u, maxDay + 1, 0L, 0L, "FLUSH"))
      val arrival = events.groupBy(_.day).toSeq.sortBy(_._1)
        .flatMap { case (_, es) => chopRng.shuffle(es) } ++ sentinels
      val in = GraftSource.memory[Scd2Event](spark)
      val q = Scd2Tracker.run(in.toDS()).writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName(name).start()
      try {
        var rest = arrival
        while (rest.nonEmpty) {
          val k = 1 + chopRng.nextInt(math.min(200, rest.size))
          in.addData(rest.take(k))
          rest = rest.drop(k)
          q.processAllAvailable()
        }
        spark.table(name).as[Scd2Out].collect()
          .map(o => (o.user_id, o.state, o.valid_from_day, o.valid_to_day)).toSet
      } finally q.stop()
    }

  /** Reference semantics, computed directly: per-day argmax state by
    * (ts, id), runs of equal consecutive daily states, closed intervals. */
  private def expectedClosed(events: Seq[Scd2Event]): Set[(Long, String, Int, Int)] =
    events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val daily = es.groupBy(_.day).toSeq.sortBy(_._1)
        .map { case (d, de) => (d, de.maxBy(e => (e.ts_us, e.event_id)).state) }
      val runs = daily.foldLeft(List.empty[(String, Int)]) {
        case (acc, (d, st)) =>
          if (acc.isEmpty || acc.head._1 != st) (st, d) :: acc else acc
      }.reverse
      runs.zip(runs.drop(1)).map { case ((st, from), (_, to)) => (u, st, from, to) }
    }.toSet

  test("sealed intervals equal the reference runs under randomized chopping + within-day shuffle") {
    for (trial <- 0 until 3) {
      val rng = new Random(7 + trial)
      val states = Vector("A", "B", "C")
      val events = for {
        u <- 0L until 5L
        d <- 0 until 20 if rng.nextInt(3) > 0 // ~2/3 of days active
        i <- 0 until (1 + rng.nextInt(3)) // 1-3 events per active day
      } yield Scd2Event(u, d, rng.nextInt(86400).toLong, i.toLong,
        states(rng.nextInt(states.size)))
      val got = drive(events, new Random(40 + trial), s"scd2_syn_$trial")
      assert(got == expectedClosed(events), s"trial $trial diverged")
    }
  }

  test("tracker state survives a checkpoint restart: no lost, no duplicate intervals") {
    import spark.implicits._
    val rng = new Random(123)
    val states = Vector("A", "B", "C")
    val events = for {
      u <- 0L until 5L
      d <- 0 until 20 if rng.nextInt(3) > 0
      i <- 0 until (1 + rng.nextInt(3))
    } yield Scd2Event(u, d, rng.nextInt(86400).toLong, i.toLong,
      states(rng.nextInt(states.size)))
    val sentinels = events.map(_.user_id).distinct
      .map(u => Scd2Event(u, events.map(_.day).max + 1, 0L, 0L, "FLUSH"))
    val arrival = events.groupBy(_.day).toSeq.sortBy(_._1)
      .flatMap { case (_, es) => rng.shuffle(es) }
    val (first, second) = arrival.splitAt(arrival.size / 2)

    withRocksDB { ck =>
      // the memory sink refuses checkpoint recovery, so collect through
      // foreachBatch (the RecoverySpec pattern); exactly-once over the
      // restart = the two incarnations' emissions partition the expected
      // set (union complete, intersection empty)
      val in = GraftSource.memory[Scd2Event](spark)
      def start(sink: java.util.Queue[(Long, String, Int, Int)]) =
        Scd2Tracker.run(in.toDS()).writeStream.outputMode("append")
          .option("checkpointLocation", ck)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[Scd2Out], _: Long) =>
            df.collect().foreach(o =>
              sink.add((o.user_id, o.state, o.valid_from_day, o.valid_to_day)))
            ()
          }.start()
      import scala.jdk.CollectionConverters._
      val sinkA = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Int)]()
      val sinkB = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int, Int)]()

      val q1 = start(sinkA)
      in.addData(first)
      q1.processAllAvailable()
      q1.stop() // "driver crash" mid-log
      val before = sinkA.asScala.toSet

      val q2 = start(sinkB) // same checkpoint: offsets + RocksDB state
      try {
        in.addData(second)
        in.addData(sentinels)
        q2.processAllAvailable()
        val after = sinkB.asScala.toSet
        assert((before intersect after).isEmpty,
          s"restart re-emitted ${(before intersect after).size} sealed intervals")
        assert(before.union(after) == expectedClosed(events),
          "restarted tracker must complete the interval set exactly")
        assert(before.nonEmpty && after.nonEmpty,
          "fixture must seal intervals on both sides of the crash")
      } finally q2.stop()
    }
  }

  test("stream equals the registry ev_scd2_state_history closed intervals on real events") {
    import spark.implicits._
    val events = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("day"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        col("event_type").as("state"))
      .as[Scd2Event].collect().toSeq
    val got = drive(events, new Random(99), "scd2_real")
    val want = graft.SparkEntry.queries("ev_scd2_state_history")(spark, sf)
      .filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("state"),
        datediff(col("valid_from"), lit("1970-01-01")).as("f"),
        datediff(col("valid_to"), lit("1970-01-01")).as("t"))
      .as[(Long, String, Int, Int)].collect().toSet
    assert(want.nonEmpty)
    assert(got == want, "streaming sealed intervals must equal batch closed intervals")
  }
}
