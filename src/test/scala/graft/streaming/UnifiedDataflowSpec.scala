package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kappa-architecture unification: the SAME transform function runs as a
  * batch query over parquet and as an incremental micro-batch stream over
  * the identical rows, and produces identical results. The reference needs
  * two different programs for this (a batch job cannot be a Gearpump app);
  * in graft the transform is one DataFrame function and the execution mode
  * is purely a property of the source. Also the only end-to-end exercise of
  * GraftSource.fileStream (HDFS-connector parity, SURVEY §2.2). */
class UnifiedDataflowSpec extends SparkTestBase {

  // one shared transform object — not two spellings of the same idea
  private val hourlyByType: DataFrame => DataFrame = df =>
    df.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  test("one transform, batch and 4-micro-batch streaming, identical results") {
    // events.parquet has shipped ts as both TIMESTAMP(NANOS) and
    // NTZ-micros across driver regenerations; same normalization as
    // graft.Tables.t, applied identically on both paths
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val prep: DataFrame => DataFrame = graft.Tables.normalizeTs

    val batchResult = hourlyByType(prep(raw)).collect().map(_.toString).sorted.toSeq
    assert(batchResult.nonEmpty)

    // split the same rows into 4 files and feed them 1 file per trigger:
    // the aggregation must accumulate across micro-batches, not per-batch
    val dir = java.nio.file.Files.createTempDirectory("unified_in").toString
    raw.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = GraftSource.fileStream(spark, dir, raw, maxFilesPerTrigger = 1)
    val q = hourlyByType(prep(stream)).writeStream
      .outputMode("complete").format("memory").queryName("unified_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        "expected the input to arrive over at least 4 micro-batches")
      val streamResult = spark.table("unified_out").collect().map(_.toString).sorted.toSeq
      assert(streamResult === batchResult)
    } finally q.stop()
  }
}
