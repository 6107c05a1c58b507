package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Streaming twin of ev_hll_rollup: windowed DISTINCT via DataSketches HLL
  * inside a watermarked streaming aggregation. The property that makes the
  * sketch column viable as long-lived streaming state is the same one
  * HllRollupSpec pins for the batch rollup — bucket-max updates are
  * commutative and idempotent — so however the input is chopped into
  * micro-batches, every closed window's estimate must equal the batch
  * estimate over the same rows BIT-FOR-BIT (not within-epsilon: identical
  * sketches give identical estimates). At 100 TB the state per open window
  * is one KB-sized sketch per key, never a distinct-user set. */
class StreamingHllSpec extends SparkTestBase {
  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("windowed HLL distinct: stream == batch bit-for-bit under randomized chopping") {
    import spark.implicits._
    // 3 windows of 10s; users revisit within and across windows so the
    // sketch must dedup within a window and NOT across windows
    val rng = new scala.util.Random(7)
    val events: Seq[(Timestamp, Long)] =
      (0 until 400).map { i => (ts(rng.nextInt(30)), rng.nextInt(40).toLong) }
    val batchEst = events.toDF("ts", "user")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user"))).as("est"),
        count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w"), col("est"), col("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    val in = GraftSource.memory[(Timestamp, Long)](spark)
    // the fixture arrives in RANDOM time order (disorder up to the full
    // 30 s span), so the allowed lateness must cover it — a tighter
    // watermark would correctly DROP stragglers and stream==batch would
    // not be the contract (WatermarkWindowSpec pins that behavior)
    val agg = in.toDS().toDF("ts", "user")
      .withWatermark("ts", "35 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user"))).as("est"),
        count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w"), col("est"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("hll_out").start()
    try {
      // random chopping: 1..50-event micro-batches, order preserved
      var rest = events
      while (rest.nonEmpty) {
        val k = 1 + rng.nextInt(50)
        in.addData(rest.take(k))
        q.processAllAvailable()
        rest = rest.drop(k)
      }
      // close every window: advance the watermark far past the last one
      in.addData(Seq((ts(100), 999L)))
      q.processAllAvailable()
      val streamed = spark.table("hll_out").as[(Long, Long, Long)].collect()
        .sortBy(_._1).filter(_._1 < 100)
      assert(streamed.sameElements(batchEst),
        s"stream ${streamed.toSeq} != batch ${batchEst.toSeq}")
      // replaying a prefix behind the watermark adds nothing: the closed
      // windows are final (exactly-once emission, late data dropped)
      in.addData(events.take(25))
      q.processAllAvailable()
      assert(spark.table("hll_out").count() == streamed.length,
        "late replay must not reopen or duplicate closed windows")
    } finally q.stop()
  }
}
