package graft.ops

import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Dynamic-DAG parity (SURVEY §3.2): the reference supports live processor
  * replacement via versioned DAG surgery + two-phase task launch
  * (reference: streaming/src/main/scala/io/gearpump/streaming/appmaster/DagManager.scala:103-160,
  * executor/Executor.scala:137-249, LifeTime handoff at TaskActor.scala:337-344).
  * Spark has no live plan mutation; the supported re-deploy path is
  * stop -> rebuild the (possibly different) query -> restart from the SAME
  * checkpoint. Source offsets and state carry over, so the swap is
  * exactly-once as long as the new plan is state-schema-compatible
  * (same aggregation keys/state types — document per change).
  */
object Redeploy {

  /** Replace a running query with a new plan resuming from its checkpoint.
    * `build` must configure the same checkpointLocation. Returns the new
    * query once started. */
  def replace[T](old: StreamingQuery, build: () => DataStreamWriter[T]): StreamingQuery = {
    old.stop()
    old.awaitTermination()
    build().start()
  }
}
