package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 adapter that runs a [[PullDataSource]] as a Structured
  * Streaming source — the engine-side half of the reference's
  * `DataSourceProcessor`/`DataSourceTask` pair
  * (reference: streaming/src/main/scala/io/gearpump/streaming/source/DataSourceProcessor.scala:34-44,
  * source/DataSourceTask.scala:35-78).
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.sources.PullSourceProvider")
  *   .option("class", "com.example.MySource")   // PullDataSource impl
  *   .option("numPartitions", "4")              // source parallelism
  *   .option("batchSize", "1000")               // reads per partition/trigger
  *   .option("maxBatches", "0")                 // >0 = bounded (tests)
  *   .load()                                    // => (event_time, value)
  * }}}
  *
  * `numPartitions` is the reference's source-processor parallelism
  * (Processor.scala:30); `batchSize` is `gearpump.source.read.batch.size`.
  * Offsets are batch indices (see PullDataSource scaladoc for semantics).
  *
  * CAVEAT — unbounded mode (`maxBatches` = 0) never quiesces: the planning
  * clock advances every trigger whether or not the source has data, so each
  * trigger re-opens the source per partition (one null read when idle) and
  * `processAllAvailable()` will not terminate. Run unbounded pull streams
  * with a ProcessingTime trigger sized to the source's cadence, use
  * `maxBatches` for drains/tests, or prefer
  * [[ReplayablePullSourceProvider]], whose record offsets stop advancing
  * when the source is idle (and add exactly-once replay).
  */
class PullSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PullSourceProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // properties keys keep the caller's case; normalize so option lookups
    // ("maxBatches" vs "maxbatches") can't silently miss
    new PullTable(properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

object PullSourceProvider {
  /** `Message{value, timestamp}` as columns. */
  val schema: StructType = StructType(Seq(
    StructField("event_time", TimestampType, nullable = false),
    StructField("value", StringType, nullable = true)))
}

private[sources] class PullTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-pull(${props.getOrElse("class", "?")})"
  override def schema(): StructType = PullSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PullSourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PullMicroBatchStream(
            className = props.getOrElse("class",
              throw new IllegalArgumentException("graft pull source requires option 'class'")),
            numPartitions = props.getOrElse("numpartitions", "1").toInt,
            batchSize = props.getOrElse("batchsize", "1000").toInt,
            maxBatches = props.getOrElse("maxbatches", "0").toLong)
      }
    }
}

/** Batch-index offset: trivially JSON-serializable for the offset WAL. */
private[sources] final case class BatchIndexOffset(batch: Long) extends Offset {
  override def json(): String = batch.toString
}

private[sources] class PullMicroBatchStream(
    className: String, numPartitions: Int, batchSize: Int, maxBatches: Long)
  extends MicroBatchStream {

  // Monotonic planning clock: each trigger exposes one more batch index.
  // Bounded mode (maxBatches > 0) stops advancing so processAllAvailable /
  // AvailableNow-style test drains terminate — the reference's
  // Watermark.MAX "source exhausted" signal (source/Watermark.scala:29-36).
  @volatile private var planned = 0L

  override def initialOffset(): Offset = BatchIndexOffset(0L)

  override def latestOffset(): Offset = {
    val next = planned + 1
    planned = if (maxBatches > 0) math.min(next, maxBatches) else next
    BatchIndexOffset(planned)
  }

  override def deserializeOffset(json: String): Offset = {
    val off = BatchIndexOffset(json.trim.toLong)
    planned = math.max(planned, off.batch)
    off
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BatchIndexOffset].batch
    val e = end.asInstanceOf[BatchIndexOffset].batch
    (0 until numPartitions).map(p =>
      PullInputPartition(p, s, e, className, batchSize): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PullPartitionReader(partition.asInstanceOf[PullInputPartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final case class PullInputPartition(
    partitionId: Int, startBatch: Long, endBatch: Long,
    className: String, batchSize: Int) extends InputPartition

/** Executor-side driver of the user source: reflective instantiation (the
  * reference's TaskLauncher reflection), then up to
  * `batchSize * (endBatch - startBatch)` reads, stopping early on null —
  * the DataSourceTask.onNext cadence, except that the reference skips nulls
  * within a batch while this reader ends the micro-batch on the first null
  * (remaining messages surface next trigger; see PullDataSource.read). */
private[sources] class PullPartitionReader(p: PullInputPartition)
  extends PartitionReader[InternalRow] {

  private val source: PullDataSource =
    Class.forName(p.className).getDeclaredConstructor()
      .newInstance().asInstanceOf[PullDataSource]
  source.open(p.partitionId, p.startBatch)

  private val maxReads: Long = p.batchSize.toLong * (p.endBatch - p.startBatch)
  private var reads = 0L
  private var current: PullMessage = _

  override def next(): Boolean = {
    if (reads >= maxReads) return false
    current = source.read()
    reads += 1
    current != null
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      current.timestampMs * 1000L, // micros
      if (current.value == null) null else UTF8String.fromString(current.value)))

  override def close(): Unit = source.close()
}
