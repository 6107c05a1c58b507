package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Sink adapter with the reference's exact `open / write / close` contract
  * (reference: streaming/src/main/scala/io/gearpump/streaming/sink/DataSink.scala:40-61),
  * mapped 1:1 onto Spark's ForeachWriter lifecycle (open per partition+epoch,
  * process per row, close). Subclasses implement the three reference methods.
  */
abstract class GraftSink[T] extends ForeachWriter[T] {
  /** reference DataSink.open(ctx) — called once per partition per epoch. */
  def openSink(partitionId: Long, epochId: Long): Unit
  /** reference DataSink.write(message). */
  def write(value: T): Unit
  /** reference DataSink.close(). */
  def closeSink(errorOrNull: Throwable): Unit

  final override def open(partitionId: Long, epochId: Long): Boolean = {
    openSink(partitionId, epochId); true
  }
  final override def process(value: T): Unit = write(value)
  final override def close(errorOrNull: Throwable): Unit = closeSink(errorOrNull)
}

object GraftSink {
  /** Exactly-once sink recipe: foreachBatch with (batchId, data) so the
    * writer can commit transactionally / idempotently per epoch — the Spark
    * counterpart of the reference's checkpoint-aligned exactly-once protocol
    * (reference: docs/contents/internals/gearpump-internals.md:132-187;
    * state/api/PersistentTask.scala:81-90). Spark may replay a failed epoch;
    * keying the write by batchId makes the replay a no-op. */
  def foreachBatchIdempotent[T](w: DataStreamWriter[T])(
      commit: (DataFrame, Long) => Unit): DataStreamWriter[T] =
    w.foreachBatch { (df: org.apache.spark.sql.Dataset[T], batchId: Long) =>
      commit(df.toDF(), batchId)
    }

  /** Kafka sink configuration (reference KafkaSink(topic, props),
    * reference: docs/contents/dev/dev-connectors.md:21-26,60-76). The input
    * frame must expose a `value` column (and optionally `key`); offline
    * container — returns the fully-configured writer, `.start()` is the
    * caller's when brokers exist. */
  def kafkaWriter(df: DataFrame, brokers: String, topic: String,
      checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
}
