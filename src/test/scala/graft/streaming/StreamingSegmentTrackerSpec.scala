package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming feature tracker == batch aggregates: the last emitted row per
  * user must carry exactly the (last_us, f, m) the batch aggregation
  * computes on the same events, for ANY chop of the stream — and stronger
  * than the ForwardFill discipline, for any ORDER, since max/count/sum are
  * commutative. The sf0.001 trial then folds the tracker output through
  * the read-time recency anchor and must reproduce the registry
  * ev_rfm_segments cells bit-for-bit, pinning the threshold constants
  * against drift between the batch query and SegmentTracker. */
class StreamingSegmentTrackerSpec extends SparkTestBase {

  test("stream equals batch under randomized chopping AND shuffling") {
    import spark.implicits._
    val rng = new Random(11)
    val events = (0 until 300).map { i =>
      SegEvent((i % 7).toLong, 1700000000000000L + rng.nextInt(1 << 30).toLong,
        rng.nextInt(5000).toLong)
    }
    val expected = events.groupBy(_.user_id).map { case (u, es) =>
      u -> ((es.map(_.us).max, es.size.toLong, es.map(_.cents).sum))
    }
    for (trial <- 0 until 3) {
      val chopRng = new Random(50 + trial)
      // shuffle globally: the tracker must not care about arrival order
      val arrival = chopRng.shuffle(events)
      val in = GraftSource.memory[SegEvent](spark)
      val q = SegmentTracker.run(in.toDS()).writeStream.outputMode("append")
        .format("memory").queryName(s"seg_out_$trial").start()
      try {
        var rest = arrival
        while (rest.nonEmpty) {
          val k = 1 + chopRng.nextInt(math.min(40, rest.size))
          in.addData(rest.take(k))
          rest = rest.drop(k)
          q.processAllAvailable()
        }
        // last emitted row per user = current feature state
        val rows = spark.table(s"seg_out_$trial").as[SegOut].collect()
        val got = rows.groupBy(_.user_id).map { case (u, rs) =>
          // f only grows: the max-f row is the latest
          val last = rs.maxBy(_.f)
          u -> ((last.last_us, last.f, last.m))
        }
        assert(got === expected, s"trial $trial diverged from batch aggregates")
      } finally q.stop()
    }
  }

  test("tracker output + read-time anchor reproduces the registry ev_rfm_segments cells") {
    import spark.implicits._
    val events = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      .as[SegEvent].collect().toSeq
    val in = GraftSource.memory[SegEvent](spark)
    val q = SegmentTracker.run(in.toDS()).writeStream.outputMode("append")
      .format("memory").queryName("seg_rfm").start()
    try {
      val chopRng = new Random(99)
      var rest = chopRng.shuffle(events)
      while (rest.nonEmpty) {
        val k = 1 + chopRng.nextInt(math.min(200, rest.size))
        in.addData(rest.take(k))
        rest = rest.drop(k)
        q.processAllAvailable()
      }
      val state = spark.table("seg_rfm").as[SegOut].collect()
        .groupBy(_.user_id).map { case (_, rs) => rs.maxBy(_.f) }.toSeq
      // read-time recency scoring against the corpus-max anchor — the half
      // the feature store leaves to the reader
      val mxUs = state.map(_.last_us).max
      val gotCells = state
        .map { s =>
          val rech = (mxUs - s.last_us) / 3600000000L
          val r = if (rech <= 4) 3 else if (rech <= 12) 2 else 1
          ((r, s.f_score, s.m_score), (1L, s.m))
        }
        .groupBy(_._1)
        .map { case (k, vs) => (k._1, k._2, k._3, vs.size.toLong, vs.map(_._2._2).sum) }
        .toSet
      val want = graft.SparkEntry.queries("ev_rfm_segments")(spark, sf)
        .as[(Int, Int, Int, Long, Long)].collect().toSet
      assert(gotCells === want, "streaming features + anchor must equal the batch RFM grid")
    } finally q.stop()
  }
}
