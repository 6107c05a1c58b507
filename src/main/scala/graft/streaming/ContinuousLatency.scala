package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Record-transit latency under Spark's continuous trigger.
  *
  * The reference publishes 8 ms average task-to-task latency for a map-only
  * pipeline (reference: docs/contents/introduction/performance-report.md:12-14)
  * — a per-RECORD transit time, which micro-batch execution structurally
  * cannot reach (each record waits for its batch; BENCH latency_ms_p50 ≈
  * the per-batch floor, ~155 ms). Spark's continuous processing mode exists
  * for exactly this shape: map-only pipelines with per-record, epoch-based
  * delivery. This probe measures the same quantity the reference reports:
  * time from source emission (the rate source stamps `timestamp` at paced
  * generation) to the row passing through the pipeline's projection.
  *
  * Measurement mechanics: a side-effecting expression records
  * `now - event_timestamp` per row into a process-local collector. Valid in
  * `local[*]` where executor threads share the driver JVM — which is the
  * only place Bench runs. On a real cluster this would be an executor-side
  * histogram shipped via the metrics system instead; the pipeline under
  * test is identical either way.
  */
object ContinuousLatency {

  // Local-mode collector: executor tasks and the driver share this JVM.
  // ConcurrentLinkedQueue: lock-free offers from 2-4 reader threads at
  // ~1k rows/s total is nowhere near contention.
  private val samples = new ConcurrentLinkedQueue[java.lang.Long]

  /** Clear collected samples (call after warmup so percentiles measure
    * steady state, not codegen/classloading ramp). */
  def reset(): Unit = samples.clear()

  def snapshot(): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    samples.forEach(l => out += l.longValue())
    out.result()
  }

  private val NoisyLoggers = Seq(
    "org.apache.spark.sql.execution.streaming.continuous.ContinuousWriteRDD",
    "org.apache.spark.sql.execution.streaming.continuous.ContinuousQueuedDataReader")

  /** Stopping a continuous query aborts its in-flight epoch by design, and
    * the epoch writers log `ERROR ContinuousWriteRDD: Writer for partition N
    * is aborting` on that expected path — scary-looking but benign noise in
    * every bench tail. Quiet exactly those two classes (shutdown-only
    * loggers); everything else keeps its level. Scoped: [[restoreNoise]]
    * puts the levels back after the probe stops, so a REAL mid-flight
    * writer/reader failure elsewhere in the JVM's lifetime still logs. */
  private def quietShutdownNoise(): Unit = try {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    NoisyLoggers.foreach(Configurator.setLevel(_, Level.FATAL))
  } catch { case _: NoClassDefFoundError => () } // non-log4j2 backend: keep the noise

  /** Restore the quieted loggers to inherit-from-parent (null level). */
  private def restoreNoise(): Unit = try {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    NoisyLoggers.foreach(Configurator.setLevel(_, null: Level))
  } catch { case _: NoClassDefFoundError => () }

  /** Start the probe: rate source → record-latency projection → noop sink,
    * under `Trigger.Continuous`. Caller is responsible for stop(). */
  def start(spark: SparkSession, rowsPerSecond: Long = 1000, numPartitions: Int = 2,
      checkpointIntervalMs: Long = 1000): StreamingQuery = {
    quietShutdownNoise()
    val record = udf { (tsMillis: Long) =>
      val lat = System.currentTimeMillis() - tsMillis
      samples.add(java.lang.Long.valueOf(lat))
      lat
    }.asNondeterministic()
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", numPartitions)
      .load()
      // unix_millis is a plain projection (continuous mode supports only
      // map-like operations — exactly this pipeline's shape)
      .select(record(unix_millis(col("timestamp"))).as("latency_ms"))
      .writeStream.format("noop")
      .trigger(Trigger.Continuous(s"$checkpointIntervalMs milliseconds"))
      .start()
  }

  /** Run the full measurement: start, warm up, reset, measure, stop.
    * Returns None if continuous mode fails to run the probe. */
  def measure(spark: SparkSession, rowsPerSecond: Long = 1000,
      warmupMs: Long = 5000, measureMs: Long = 10000): Option[graft.ops.AppRegistry.LatencyHistogram] = {
    val q = start(spark, rowsPerSecond)
    try {
      Thread.sleep(warmupMs)
      // surface a start-up crash (unsupported plan, sink rejection) now
      // rather than returning an empty histogram
      if (!q.isActive) { q.awaitTermination(1); return None }
      reset()
      Thread.sleep(measureMs)
      graft.ops.AppRegistry.histogramOf(snapshot())
    } finally {
      if (q.isActive) q.stop()
      restoreNoise() // suppression is probe-scoped, not JVM-lifetime
    }
  }
}
