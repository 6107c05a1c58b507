package graft.sources

/** The user-facing pull-source contract — a faithful port of the reference's
  * `DataSource` plugin API
  * (reference: streaming/src/main/scala/io/gearpump/streaming/source/DataSource.scala:41-72):
  * `open(ctx, startTime) / read(): Message / close / getWatermark`, driven in
  * batches of `gearpump.source.read.batch.size` (default 1000) by
  * `DataSourceTask.onNext`
  * (reference: source/DataSourceTask.scala:35-78, batch size at :48,
  * source/DataSourceConfig.scala:18).
  *
  * Spark-native disposition (SURVEY §2.1 #7-9): the micro-batch engine IS the
  * reference's read loop, so an implementation of this trait plugs into
  * Structured Streaming through [[graft.sources.PullSourceProvider]] (a
  * DataSource V2 `TableProvider` + `MicroBatchStream`). Each trigger pulls at
  * most `batchSize` messages per partition — the exact `DataSourceTask`
  * cadence — and the stream's rows are `(event_time TIMESTAMP, value STRING)`,
  * the relational form of `Message{value, timestamp}`
  * (reference: core/src/main/scala/io/gearpump/Message.scala:20-25).
  *
  * Delivery semantics: offsets are BATCH INDICES, not record offsets — a
  * replayed batch index re-pulls from the live source, i.e. at-least-once,
  * matching the reference's non-replayable-source guarantee; exactly-once
  * needs a timestamp-replayable source (reference:
  * transaction/api/TimeReplayableSource.scala:25-31), which in Spark is the
  * Kafka/file source offset WAL (GraftSource.kafkaReader / fileStream).
  *
  * Implementations MUST have a public no-arg constructor (instantiated
  * reflectively on executors, like the reference's Task reflection at
  * executor/TaskLauncher.scala).
  */
trait PullDataSource extends Serializable {
  /** Called once per partition before the first `read` of a micro-batch run.
    * `startBatch` is the first batch index this reader will serve — the
    * analog of the reference's `startTime` replay point. */
  def open(partitionId: Int, startBatch: Long): Unit

  /** Pull the next message, or null when nothing is currently available.
    * NOTE a deliberate divergence from the reference's read loop
    * (source/DataSourceTask.scala:54-62, which SKIPS nulls and keeps
    * reading within the batch): here the first null ends the partition's
    * micro-batch early, deferring any remaining messages to the next
    * trigger. Intermittently-null sources therefore deliver fewer messages
    * per trigger than the reference would — same totals, later batches. */
  def read(): PullMessage

  /** Release resources (end of the micro-batch run for this partition). */
  def close(): Unit

  /** Source watermark in epoch millis — "no message with a timestamp earlier
    * than this will be emitted" (reference: source/Watermark.scala:22-36).
    * NOT consumed by the DSv2 adapter: Structured Streaming derives
    * watermarks from the event_time column (apply `withWatermark` on the
    * loaded stream), so this exists for API-shape parity and for custom
    * drivers that poll the source directly. */
  def getWatermarkMs: Long = 0L
}

/** Relational `Message` (reference: core/.../Message.scala:20-25). */
final case class PullMessage(value: String, timestampMs: Long)
