package graft.streaming

import graft.SparkTestBase

import scala.util.Random

/** Streaming hops == batch lead(): counting the emitted hop rows must equal
  * the batch window formulation (`ev_transition_matrix`'s lead() pass) on
  * the same events, for ANY order-preserving chop into micro-batches. */
class StreamingTransitionSpec extends SparkTestBase {

  private val Types = Vector("view", "click", "purchase", "error")

  private def mkEvents(rng: Random): Seq[TmEvent] = {
    def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    (0 until 80).map { i =>
      TmEvent(i.toLong, (i % 4).toLong, ts(i), Types(rng.nextInt(Types.size)))
    }
  }

  /** reference semantics: per user in (ts, event_id) order, one hop per
    * consecutive pair. */
  private def batchHops(evs: Seq[TmEvent]): Map[(String, String), Int] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (a.event_type, b.event_type) }
    }.groupBy(identity).map { case (k, v) => k -> v.size }

  test("hop counts equal the batch lead() matrix under randomized chopping") {
    import spark.implicits._
    val events = mkEvents(new Random(7))
    val expected = batchHops(events)

    for (trial <- 0 until 3) {
      val chopRng = new Random(200 + trial)
      val in = GraftSource.memory[TmEvent](spark)
      val q = Transitions.hops(in.toDS()).writeStream.outputMode("append")
        .format("memory").queryName(s"tm_out_$trial").start()
      try {
        var rest = events
        while (rest.nonEmpty) {
          val k = 1 + chopRng.nextInt(math.min(15, rest.size))
          in.addData(rest.take(k))
          rest = rest.drop(k)
          q.processAllAvailable()
        }
        val got = spark.table(s"tm_out_$trial").as[TmHop].collect()
          .groupBy(h => (h.from_type, h.to_type)).map { case (k, v) => k -> v.size }
        assert(got === expected, s"trial $trial diverged from batch lead() matrix")
      } finally q.stop()
    }
  }
}
