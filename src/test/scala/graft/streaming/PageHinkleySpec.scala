package graft.streaming

import graft.SparkTestBase

import scala.util.Random

/** Page-Hinkley emissions == the hand-rolled prefix reference, bit-exact,
  * for any order-preserving chop — and a planted upward level shift raises
  * an alarm while the stable prefix stays silent. */
class PageHinkleySpec extends SparkTestBase {

  private def mkEvents(rng: Random): Seq[FfEvent] = {
    val base = 1700000000000L
    (0 until 120).map { i =>
      // per-key index: stable around ~5 for the first 40 observations of
      // each key, then shifted up to ~105 — a clear drift
      val perKey = i / 2
      val v = (if (perKey < 40) 0 else 100) + rng.nextInt(10).toDouble
      FfEvent(i.toLong, (i % 2).toLong,
        new java.sql.Timestamp(base + i * 1000L), Some(v))
    }
  }

  /** prefix reference: the identical recurrence in the same per-key order. */
  private def reference(evs: Seq[FfEvent]): Seq[PhOut] =
    evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      var (n, mean, m, mMin) = (0L, 0.0, 0.0, 0.0)
      es.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
        e.v.map { v =>
          n += 1
          mean = mean + (v - mean) / n
          m = m + (v - mean - PageHinkley.Delta)
          mMin = math.min(mMin, m)
          val ph = m - mMin
          PhOut(e.event_id, u, n, ph, ph > PageHinkley.Lambda, e.ts)
        }
      }
    }

  test("online drift detection is bit-exact under randomized chopping; the shift alarms") {
    import spark.implicits._
    val events = mkEvents(new Random(31))
    val expected = reference(events).toSet
    // the construction must actually produce both regimes
    assert(expected.exists(_.alarm) && expected.exists(!_.alarm))
    // nothing alarms before the shift arrives (first 40 per key)
    assert(expected.filter(_.n_seen <= 40).forall(!_.alarm))

    val chopRng = new Random(77)
    val in = GraftSource.memory[FfEvent](spark)
    val q = PageHinkley.detect(in.toDS()).writeStream.outputMode("append")
      .format("memory").queryName("ph_out").start()
    try {
      var rest = events
      while (rest.nonEmpty) {
        val k = 1 + chopRng.nextInt(math.min(8, rest.size))
        in.addData(rest.take(k))
        rest = rest.drop(k)
        q.processAllAvailable()
      }
      val got = spark.table("ph_out").as[PhOut].collect().toSet
      assert(got === expected)
    } finally q.stop()
  }
}
