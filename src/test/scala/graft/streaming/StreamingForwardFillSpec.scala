package graft.streaming

import graft.SparkTestBase

import scala.util.Random

/** Streaming LOCF == batch LOCF: the stream result must equal the batch
  * window formulation (`ev_forward_fill`'s last(ignoreNulls) frame) on the
  * same events, for ANY order-preserving chop of the stream into
  * micro-batches — the same parity discipline CepPropertySpec applies to
  * the CEP detector. */
class StreamingForwardFillSpec extends SparkTestBase {

  private def mkEvents(rng: Random): Seq[FfEvent] = {
    def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    (0 until 60).map { i =>
      val user = i % 3
      val v = if (rng.nextDouble() < 0.4) None else Some(rng.nextInt(100).toDouble)
      FfEvent(i.toLong, user.toLong, ts(i), v)
    }
  }

  /** reference semantics: per user in (ts, event_id) order, carry the last
    * non-null value forward. */
  private def batchLocf(evs: Seq[FfEvent]): Set[(Long, Long, Option[Double])] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      var carry: Option[Double] = None
      es.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        carry = e.v.orElse(carry)
        (e.event_id, u, carry)
      }
    }.toSet

  test("stream equals batch under randomized order-preserving chopping") {
    import spark.implicits._
    val rng = new Random(42)
    val events = mkEvents(rng)
    val expected = batchLocf(events)

    for (trial <- 0 until 3) {
      val chopRng = new Random(100 + trial)
      val in = GraftSource.memory[FfEvent](spark)
      val out = ForwardFill.run(in.toDS())
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(s"ff_out_$trial").start()
      try {
        // chop the per-key-ordered event list into 1..n random batches
        var rest = events
        while (rest.nonEmpty) {
          val k = 1 + chopRng.nextInt(math.min(12, rest.size))
          in.addData(rest.take(k))
          rest = rest.drop(k)
          q.processAllAvailable()
        }
        val got = spark.table(s"ff_out_$trial").as[FfOut].collect()
          .map(o => (o.event_id, o.user_id, o.filled)).toSet
        assert(got === expected, s"trial $trial diverged from batch LOCF")
      } finally q.stop()
    }
  }

  test("the carry survives a batch that starts with nulls") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val in = GraftSource.memory[FfEvent](spark)
    val q = ForwardFill.run(in.toDS()).writeStream.outputMode("append")
      .format("memory").queryName("ff_carry").start()
    try {
      in.addData(Seq(FfEvent(0, 7, ts(0), Some(5.0)), FfEvent(1, 7, ts(1), None)))
      q.processAllAvailable()
      in.addData(Seq(FfEvent(2, 7, ts(2), None), FfEvent(3, 7, ts(3), Some(9.0))))
      q.processAllAvailable()
      val got = spark.table("ff_carry").as[FfOut].collect()
        .map(o => o.event_id -> o.filled).toMap
      assert(got === Map(0L -> Some(5.0), 1L -> Some(5.0),
        2L -> Some(5.0), 3L -> Some(9.0)))
    } finally q.stop()
  }
}
