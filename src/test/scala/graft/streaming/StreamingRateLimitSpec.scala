package graft.streaming

import graft.SparkTestBase

import scala.util.Random

object RateLimitCollector {
  val admitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
}

/** Streaming rate limit == batch rate limit: the admitted-event set must
  * equal the batch `ev_rate_limit` formulation (ranked window per
  * (user, day)) on the same events, for ANY order-preserving chop of the
  * stream into micro-batches — the ForwardFill/CEP parity discipline. */
class StreamingRateLimitSpec extends SparkTestBase {

  private val DayMs = 86400000L
  private val MaxPerDay = 2

  private def mkEvents(rng: Random): Seq[RlEvent] =
    (0 until 80).map { i =>
      val user = i % 4
      // jump days occasionally so quotas reset mid-stream
      val day = i / 25
      val sec = rng.nextInt(50000)
      RlEvent(i.toLong, user.toLong,
        new java.sql.Timestamp(1700006400000L / DayMs * DayMs + day * DayMs + sec * 1000L))
    }.sortBy(e => (e.user_id, e.ts.getTime, e.event_id))
      .sortBy(_.ts.getTime) // global arrival by time keeps per-key order too

  /** reference semantics: per (user, day) in (ts, event_id) order, keep the
    * first MaxPerDay events. */
  private def batchLimit(evs: Seq[RlEvent]): Set[Long] =
    evs.groupBy(e => (e.user_id, Math.floorDiv(e.ts.getTime, DayMs)))
      .flatMap { case (_, es) =>
        es.sortBy(e => (e.ts.getTime, e.event_id)).take(MaxPerDay).map(_.event_id)
      }.toSet

  test("stream equals batch under randomized order-preserving chopping") {
    import spark.implicits._
    val events = mkEvents(new Random(7))
    val expected = batchLimit(events)
    assert(expected.size < events.size, "the cap must actually drop events")

    for (trial <- 0 until 3) {
      val chopRng = new Random(200 + trial)
      val in = GraftSource.memory[RlEvent](spark)
      val q = RateLimit.run(in.toDS(), MaxPerDay).writeStream.outputMode("append")
        .format("memory").queryName(s"rl_out_$trial").start()
      try {
        var rest = events
        while (rest.nonEmpty) {
          val k = 1 + chopRng.nextInt(math.min(15, rest.size))
          in.addData(rest.take(k))
          rest = rest.drop(k)
          q.processAllAvailable()
        }
        val got = spark.table(s"rl_out_$trial").as[RlOut].collect()
          .map(_.event_id).toSet
        assert(got === expected, s"trial $trial diverged from batch rate limit")
      } finally q.stop()
    }
  }

  test("admission state survives a checkpoint restart — no quota reset, no dup admits") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft-rl-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-rl-ck").toString
    RateLimitCollector.admitted.clear()
    val d0 = 1700006400000L / DayMs * DayMs
    def ev(id: Long, t: Long) = RlEvent(id, 9L, new java.sql.Timestamp(t))
    def addFile(name: String, evs: Seq[RlEvent]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-rl-stage").toString
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"$name.parquet"))
      ()
    }
    def startQuery() = {
      val stream = spark.readStream.schema(Seq.empty[RlEvent].toDS().schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir).as[RlEvent]
      RateLimit.run(stream, MaxPerDay).writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[RlOut], _: Long) =>
          ds.collect().foreach(o => RateLimitCollector.admitted.add(o.event_id)); ()
        }.start()
    }
    // day quota is 2: the first run admits 0,1 and drops 2
    addFile("b0", Seq(ev(0, d0), ev(1, d0 + 1000), ev(2, d0 + 2000)))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop() // "crash"
    // after restart the SAME day must stay exhausted; the next day admits
    addFile("b1", Seq(ev(3, d0 + 3000), ev(4, d0 + DayMs)))
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    assert(RateLimitCollector.admitted.asScala.toSet === Set(0L, 1L, 4L),
      s"admitted: ${RateLimitCollector.admitted.asScala.toSeq.sorted}")
  }

  test("quota resets on a new event-time day and emits the day bucket") {
    import spark.implicits._
    val d0 = 1700006400000L / DayMs * DayMs
    def ev(id: Long, t: Long) = RlEvent(id, 5L, new java.sql.Timestamp(t))
    val in = GraftSource.memory[RlEvent](spark)
    val q = RateLimit.run(in.toDS(), MaxPerDay).writeStream.outputMode("append")
      .format("memory").queryName("rl_reset").start()
    try {
      in.addData(Seq(ev(0, d0), ev(1, d0 + 1000), ev(2, d0 + 2000)))
      q.processAllAvailable() // third same-day event must be dropped
      in.addData(Seq(ev(3, d0 + DayMs), ev(4, d0 + DayMs + 1000)))
      q.processAllAvailable() // new day: quota resets, both admitted
      val got = spark.table("rl_reset").as[RlOut].collect()
        .map(o => o.event_id -> o.day_start.getTime).toMap
      assert(got === Map(0L -> d0, 1L -> d0, 3L -> (d0 + DayMs), 4L -> (d0 + DayMs)))
    } finally q.stop()
  }
}
