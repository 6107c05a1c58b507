package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{ContinuousPartitionReader, ContinuousPartitionReaderFactory, ContinuousStream, MicroBatchStream, Offset, PartitionOffset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 adapter for [[ReplayablePullDataSource]] — the
  * exactly-once half of the reference's source API
  * (reference: streaming/src/main/scala/io/gearpump/streaming/transaction/api/TimeReplayableSource.scala:20-31;
  * Kafka offset mechanics per docs/contents/internals/gearpump-internals.md:196-227).
  *
  * Offsets are per-partition RECORD offsets (the Kafka shape), persisted in
  * the Structured Streaming offset WAL under `checkpointLocation` — the
  * Spark-native form of the reference's `CheckpointStore` (timestamp →
  * source-offset) pairs. A restart replans the exact ranges of the failed
  * epoch, and because `read(p, o)` is deterministic per offset, the replay
  * delivers byte-identical records: end-to-end exactly-once with any
  * epoch-idempotent sink.
  *
  * Unlike the batch-index [[PullSourceProvider]], an idle source quiesces:
  * when `available` stops growing, `latestOffset` equals the committed
  * offset, no batch is planned, and `processAllAvailable()` terminates.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.sources.ReplayablePullSourceProvider")
  *   .option("class", "com.example.MyReplayableSource")
  *   .option("numPartitions", "4")
  *   .option("maxRecordsPerTrigger", "1000")   // 0 = unbounded batches
  *   .load()                                   // => (event_time, value)
  * }}}
  *
  * Both trigger families run the same plugin: the default micro-batch
  * trigger plans offset ranges per batch; `Trigger.Continuous` keeps
  * long-running per-partition tasks that emit each record as it appears
  * (per-record latency — the reference's DataSourceTask forwarding shape;
  * requires `available` to be executor-callable, `continuousPollMs`
  * tunes the idle poll).
  */
class ReplayablePullSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PullSourceProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // normalize key case — see PullSourceProvider.getTable
    new ReplayablePullTable(properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

private[sources] class ReplayablePullTable(props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = s"graft-replayable-pull(${props.getOrElse("class", "?")})"
  override def schema(): StructType = PullSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.CONTINUOUS_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        private def className = props.getOrElse("class",
          throw new IllegalArgumentException("graft replayable pull source requires option 'class'"))
        override def readSchema(): StructType = PullSourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayableMicroBatchStream(
            className = className,
            numPartitions = props.getOrElse("numpartitions", "1").toInt,
            maxRecordsPerTrigger = props.getOrElse("maxrecordspertrigger", "0").toLong)
        override def toContinuousStream(checkpointLocation: String): ContinuousStream =
          new ReplayableContinuousStream(
            className = className,
            numPartitions = props.getOrElse("numpartitions", "1").toInt,
            pollIntervalMs = props.getOrElse("continuouspollms", "5").toLong)
      }
    }
}

/** Per-partition record offsets (exclusive upper bounds), WAL-serialized as
  * a comma-joined list — partition i's next offset at position i. */
private[sources] final case class RecordOffsets(upTo: Vector[Long]) extends Offset {
  override def json(): String = upTo.mkString(",")
}

private[sources] object RecordOffsets {
  def parse(json: String): RecordOffsets =
    RecordOffsets(json.trim.split(",").map(_.trim.toLong).toVector)
}

private[sources] class ReplayableMicroBatchStream(
    className: String, numPartitions: Int, maxRecordsPerTrigger: Long)
  extends MicroBatchStream {

  // Driver-side instance: plans batches (available) and receives acks —
  // the role the reference's AppMaster-side OffsetManager plays
  // (gearpump-internals.md:196-227).
  private lazy val planner: ReplayablePullDataSource =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[ReplayablePullDataSource]

  // Highest offsets planned so far; the admission-control base for the
  // maxRecordsPerTrigger cap.
  @volatile private var planned: Vector[Long] = Vector.fill(numPartitions)(0L)

  override def initialOffset(): Offset = RecordOffsets(Vector.fill(numPartitions)(0L))

  override def latestOffset(): Offset = {
    val next = Vector.tabulate(numPartitions) { p =>
      val avail = planner.available(p)
      val capped = if (maxRecordsPerTrigger > 0) math.min(avail, planned(p) + maxRecordsPerTrigger)
                   else avail
      math.max(planned(p), capped) // offsets never move backwards
    }
    planned = next
    RecordOffsets(next)
  }

  override def deserializeOffset(json: String): Offset = {
    val off = RecordOffsets.parse(json)
    planned = Vector.tabulate(numPartitions)(p =>
      math.max(planned(p), off.upTo.applyOrElse(p, (_: Int) => 0L)))
    off
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RecordOffsets].upTo
    val e = end.asInstanceOf[RecordOffsets].upTo
    (0 until numPartitions).map(p =>
      ReplayableInputPartition(p, s.applyOrElse(p, (_: Int) => 0L),
        e.applyOrElse(p, (_: Int) => 0L), className): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new ReplayablePartitionReader(partition.asInstanceOf[ReplayableInputPartition])
    }

  /** Epoch durably committed: release the retention hold — the reference's
    * checkpoint-store trim. */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[RecordOffsets].upTo
    (0 until numPartitions).foreach(p => planner.ack(p, e.applyOrElse(p, (_: Int) => 0L)))
  }

  override def stop(): Unit = planner.close()
}

private[sources] final case class ReplayableInputPartition(
    partitionId: Int, start: Long, end: Long, className: String) extends InputPartition

// ---------------------------------------------------------------------------
// Continuous (per-record) execution — the mode that matches the reference's
// task-to-task delivery: the reference's DataSourceTask pulls records one at
// a time and forwards each immediately (reference:
// streaming/src/main/scala/io/gearpump/streaming/source/DataSourceTask.scala:35-78);
// a micro-batch trigger quantizes that into per-batch latency. Under
// Trigger.Continuous the same ReplayablePullDataSource plugin streams
// per-record: long-running tasks poll `available` ON THE EXECUTOR and emit
// each record as it appears, with epoch markers injected by the engine.
//
// Extra contract for continuous mode (beyond the ReplayablePullDataSource
// scaladoc): `available(p)` must be callable from the reader task, not just
// the driver — true for any Kafka-shaped source where availability is a
// property of the external system, and for the in-process test ledger.
// Exactly-once is unchanged: epoch offsets land in the WAL via mergeOffsets
// of the per-partition reader positions, and a recovered epoch replays the
// same deterministic record ranges.
// ---------------------------------------------------------------------------

/** One partition's reader position inside an epoch. */
private[sources] final case class ReplayablePartitionOffset(
    partition: Int, offset: Long) extends PartitionOffset

private[sources] class ReplayableContinuousStream(
    className: String, numPartitions: Int, pollIntervalMs: Long)
  extends ContinuousStream {

  // driver-side instance for the commit-hook acks (retention trim),
  // mirroring ReplayableMicroBatchStream's planner role
  private lazy val planner: ReplayablePullDataSource =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[ReplayablePullDataSource]

  override def initialOffset(): Offset = RecordOffsets(Vector.fill(numPartitions)(0L))

  override def deserializeOffset(json: String): Offset = RecordOffsets.parse(json)

  /** Epoch boundary: the engine collects each partition reader's position
    * and this fold makes the WAL entry — the same RecordOffsets shape the
    * micro-batch path persists, so the two modes' checkpoints line up. */
  override def mergeOffsets(offsets: Array[PartitionOffset]): Offset = {
    val byPartition = offsets.collect {
      case o: ReplayablePartitionOffset => o.partition -> o.offset
    }.toMap
    RecordOffsets(Vector.tabulate(numPartitions)(p => byPartition.getOrElse(p, 0L)))
  }

  override def planInputPartitions(start: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RecordOffsets].upTo
    (0 until numPartitions).map(p =>
      ReplayableContinuousInputPartition(p, s.applyOrElse(p, (_: Int) => 0L),
        className, pollIntervalMs): InputPartition).toArray
  }

  override def createContinuousReaderFactory(): ContinuousPartitionReaderFactory =
    new ContinuousPartitionReaderFactory {
      override def createReader(partition: InputPartition): ContinuousPartitionReader[InternalRow] =
        new ReplayableContinuousReader(
          partition.asInstanceOf[ReplayableContinuousInputPartition])
    }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[RecordOffsets].upTo
    (0 until numPartitions).foreach(p => planner.ack(p, e.applyOrElse(p, (_: Int) => 0L)))
  }

  override def stop(): Unit = planner.close()
}

private[sources] final case class ReplayableContinuousInputPartition(
    partitionId: Int, start: Long, className: String, pollIntervalMs: Long)
  extends InputPartition

/** Long-running executor-side reader: emits record `offset` as soon as
  * `available` passes it. `next()` blocking until data exists is the
  * continuous-reader contract (the engine wraps this in a queued reader
  * thread that injects epoch markers between records); the poll sleep is
  * interrupted by task kill at stop. */
private[sources] class ReplayableContinuousReader(p: ReplayableContinuousInputPartition)
  extends ContinuousPartitionReader[InternalRow] {

  private val source: ReplayablePullDataSource =
    Class.forName(p.className).getDeclaredConstructor()
      .newInstance().asInstanceOf[ReplayablePullDataSource]
  source.open(p.partitionId)

  private var offset = p.start
  private var current: PullMessage = _

  override def next(): Boolean = {
    while (offset >= source.available(p.partitionId)) Thread.sleep(p.pollIntervalMs)
    current = source.read(p.partitionId, offset)
    offset += 1
    true
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      current.timestampMs * 1000L, // micros
      if (current.value == null) null else UTF8String.fromString(current.value)))

  /** Position AFTER the last emitted record — what mergeOffsets folds into
    * the epoch's RecordOffsets (exclusive upper bound, micro-batch parity). */
  override def getOffset: PartitionOffset = ReplayablePartitionOffset(p.partitionId, offset)

  override def close(): Unit = source.close()
}

/** Executor-side reader: exactly the records [start, end) — deterministic on
  * replay, which is the whole point. */
private[sources] class ReplayablePartitionReader(p: ReplayableInputPartition)
  extends PartitionReader[InternalRow] {

  private val source: ReplayablePullDataSource =
    Class.forName(p.className).getDeclaredConstructor()
      .newInstance().asInstanceOf[ReplayablePullDataSource]
  source.open(p.partitionId)

  private var offset = p.start
  private var current: PullMessage = _

  override def next(): Boolean = {
    if (offset >= p.end) return false
    current = source.read(p.partitionId, offset)
    offset += 1
    true
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      current.timestampMs * 1000L, // micros
      if (current.value == null) null else UTF8String.fromString(current.value)))

  override def close(): Unit = source.close()
}
