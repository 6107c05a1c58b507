package graft.streaming

import graft.SparkTestBase

import scala.util.Random

/** Online z-scores == the hand-rolled prefix reference, bit-exact, for any
  * order-preserving chop — and a planted spike flags while the cold-start
  * guard keeps the first MinN observations unscored. */
class OnlineStatsSpec extends SparkTestBase {

  private def mkEvents(rng: Random): Seq[FfEvent] = {
    val base = 1700000000000L
    (0 until 80).map { i =>
      // two keys; values mostly in [0,10) with a planted spike per key
      val v = if (i == 60 || i == 61) 1000.0 else rng.nextInt(10).toDouble
      FfEvent(i.toLong, (i % 2).toLong,
        new java.sql.Timestamp(base + i * 1000L), Some(v))
    }
  }

  /** prefix reference: the identical Welford recurrence, in the same
    * per-key (ts, event_id) order. */
  private def reference(evs: Seq[FfEvent]): Seq[ZsOut] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      var (n, mean, m2) = (0L, 0.0, 0.0)
      es.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
        e.v.map { v =>
          val z =
            if (n >= OnlineStats.MinN && m2 > 0.0)
              Some((v - mean) / math.sqrt(m2 / n))
            else None
          val n1 = n + 1
          val d = v - mean
          val mean1 = mean + d / n1
          n = n1; m2 = m2 + d * (v - mean1); mean = mean1
          ZsOut(e.event_id, u, n1, z, z.exists(x => math.abs(x) >= OnlineStats.Threshold))
        }
      }
    }

  test("prefix z-scores are bit-exact under randomized chopping; spikes flag") {
    import spark.implicits._
    val events = mkEvents(new Random(23))
    val expected = reference(events).toSet

    val chopRng = new Random(99)
    val in = GraftSource.memory[FfEvent](spark)
    val q = OnlineStats.zscores(in.toDS()).writeStream.outputMode("append")
      .format("memory").queryName("zs_out").start()
    try {
      var rest = events
      while (rest.nonEmpty) {
        val k = 1 + chopRng.nextInt(math.min(9, rest.size))
        in.addData(rest.take(k))
        rest = rest.drop(k)
        q.processAllAvailable()
      }
      val got = spark.table("zs_out").as[ZsOut].collect().toSet
      assert(got === expected)
      // the planted spikes (ids 60, 61 — one per key) must flag, and
      // nothing in the tame stream before them should
      val flagged = got.filter(_.anomalous).map(_.event_id)
      assert(flagged === Set(60L, 61L), s"flagged $flagged")
      // cold start: the first MinN observations per key carry no score
      assert(got.filter(_.n_seen <= OnlineStats.MinN).forall(_.z.isEmpty))
    } finally q.stop()
  }
}
