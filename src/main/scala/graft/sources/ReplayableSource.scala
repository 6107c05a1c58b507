package graft.sources

/** EXACTLY-ONCE pull-source contract — the analog of the reference's
  * `TimeReplayableSource` (reference:
  * streaming/src/main/scala/io/gearpump/streaming/transaction/api/TimeReplayableSource.scala:20-31,
  * offset mechanics per docs/contents/internals/gearpump-internals.md:196-227):
  * records are addressable by a monotonically increasing per-partition
  * RECORD offset (the Kafka shape), so a replayed epoch re-reads exactly the
  * records the crashed attempt read. This is the property the plain
  * [[PullDataSource]] cannot offer (its batch-index offsets re-pull live
  * data on replay — at-least-once).
  *
  * Spark-native disposition: the reference pairs the replayable source with
  * a `CheckpointStore` that persists (timestamp, source offsets); in
  * Structured Streaming that store IS the offset WAL under
  * `checkpointLocation` — [[ReplayablePullSourceProvider]] records the
  * per-partition record ranges there, and a restart replans the exact same
  * ranges. End-to-end exactly-once then follows with any epoch-idempotent
  * sink (graft.streaming.GraftSink.foreachBatchIdempotent or the file sink's
  * metadata log).
  *
  * Contract:
  *  - offsets `[0, available(p))` are stable: `read(p, o)` returns the same
  *    record on every call, across processes (replay window; Kafka retention
  *    is the reference analog);
  *  - `available` may only grow;
  *  - implementations need a public no-arg constructor (instantiated
  *    reflectively on the driver for planning and on executors for reads).
  */
trait ReplayablePullDataSource extends Serializable {
  /** Called once per partition before the first `read` of a task. */
  def open(partitionId: Int): Unit

  /** Exclusive upper bound of currently readable record offsets for the
    * partition. Called on the DRIVER each trigger to plan the batch. */
  def available(partitionId: Int): Long

  /** The record at `offset` (< available). Deterministic per (p, offset). */
  def read(partitionId: Int, offset: Long): PullMessage

  /** Release task resources. */
  def close(): Unit

  /** Post-commit hook, driver-side, once per epoch per partition: all
    * offsets below `upTo` are durably processed and may be trimmed — the
    * retention half of the reference's checkpoint-store contract. */
  def ack(partitionId: Int, upTo: Long): Unit = ()
}
