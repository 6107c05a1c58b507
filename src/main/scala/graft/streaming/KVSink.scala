package graft.streaming

/** Wide-column KV sink — API parity with the reference's HBase connector
  * (reference: docs/contents/dev/dev-connectors.md:21-26 "HBaseSink | Write
  * the message to HBase. The message to write must be HBase `Put` or a tuple
  * of `(rowKey, family, column, value)`", usage :103-140). The container has
  * no HBase client libraries (and no cluster to talk to), so the CLIENT is an
  * injection point: [[KVClientFactory]] is the seam where a real
  * `org.apache.hadoop.hbase.client.Connection` plugs in, and everything on
  * the Spark side — ForeachWriter lifecycle, per-partition client reuse,
  * epoch replay semantics — is real and spec-pinned (KVSinkSpec).
  *
  * Delivery: rowkey-keyed puts are UPSERTS, so replaying an epoch after a
  * crash converges to the same store state (idempotent at-least-once — the
  * same statement the reference makes for its HBase sink; gearpump's
  * exactly-once requires the transactional topology, graft's requires the
  * epoch-keyed recipe in [[GraftSink.foreachBatchIdempotent]]).
  *
  * Scale: one client per partition per epoch (openSink), puts streamed
  * per-row and flushed once at close — the buffered-mutator shape HBase
  * wants; no driver-side funneling, every partition writes independently.
  */
trait KVClient {
  def put(table: String, rowKey: String, family: String, qualifier: String,
      value: Array[Byte]): Unit
  /** Drain any client-side write buffer (HBase BufferedMutator.flush). */
  def flush(): Unit = ()
  def close(): Unit = ()
}

/** Serializable factory shipped to executors; `create()` runs inside
  * `openSink`, once per partition per epoch — never on the driver. */
trait KVClientFactory extends Serializable {
  def create(): KVClient
}

/** The sink itself: rows are the reference's `(rowKey, family, column,
  * value)` message tuples. */
final class KVSink(table: String, factory: KVClientFactory)
    extends GraftSink[(String, String, String, Array[Byte])] {

  @transient private var client: KVClient = _

  override def openSink(partitionId: Long, epochId: Long): Unit =
    client = factory.create()

  override def write(v: (String, String, String, Array[Byte])): Unit =
    client.put(table, v._1, v._2, v._3, v._4)

  override def closeSink(errorOrNull: Throwable): Unit =
    if (client != null) {
      try if (errorOrNull == null) client.flush()
      finally client.close()
    }
}
