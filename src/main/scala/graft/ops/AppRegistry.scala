package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import scala.collection.concurrent.TrieMap

/** Ops/introspection layer — library-level parity with the reference's REST
  * surface (reference: services/jvm/src/main/scala/io/gearpump/services/{AppMasterService,MasterService}.scala;
  * spec docs/contents/dev/dev-rest-api.md):
  *  - `applist`            -> active streaming queries
  *  - `appmaster/<id>`     -> per-query detail (status + last progress)
  *  - `.../metrics`        -> throughput/latency series (the reference tracks
  *    receiveThroughput/processTime per task, task/TaskActor.scala:56-62)
  *  - `.../stallingtasks`  -> queries without progress for > threshold
  *    (HealthChecker stallingThresholdSeconds=60,
  *    reference: appmaster/ClockService.scala:48,373)
  * Exposed as JSON strings so an HTTP layer is a trivial wrapper.
  */
final class AppRegistry(spark: SparkSession) {

  final case class Metrics(
      batchId: Long, inputRowsPerSecond: Double, processedRowsPerSecond: Double,
      batchDurationMs: Long, numInputRows: Long, timestamp: String)

  private val lastSeen = TrieMap.empty[java.util.UUID, (Long, Metrics)] // id -> (nanoTime, m)

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      lastSeen.put(p.id, (System.nanoTime(),
        Metrics(p.batchId, nz(p.inputRowsPerSecond), nz(p.processedRowsPerSecond),
          p.durationMs.values.stream.mapToLong(_.longValue).sum, p.numInputRows,
          p.timestamp)))
      ()
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      lastSeen.remove(e.id); ()
    }
  }
  spark.streams.addListener(listener)

  private def nz(d: Double) = if (d.isNaN) 0.0 else d

  def active: Seq[StreamingQuery] = spark.streams.active.toSeq

  /** REST `applist` parity. */
  def applist: String =
    active.map(q => s"""{"id":"${q.id}","name":${jstr(q.name)},"isActive":${q.isActive}}""")
      .mkString("[", ",", "]")

  /** REST `appmaster/<id>` parity: status + last progress. */
  def appDetail(id: java.util.UUID): Option[String] =
    active.find(_.id == id).map { q =>
      val m = lastSeen.get(id).map(_._2)
      s"""{"id":"${q.id}","name":${jstr(q.name)},"status":${q.status.json},""" +
        s""""lastProgress":${m.fold("null")(fmt)}}"""
    }

  /** REST `.../metrics` parity. */
  def metrics: Map[String, Metrics] =
    lastSeen.map { case (id, (_, m)) => id.toString -> m }.toMap

  /** REST `.../stallingtasks` parity: active queries with no progress event
    * within the threshold (default mirrors the reference's 60 s). */
  def stalling(thresholdMs: Long = 60000): Seq[StreamingQuery] = {
    val now = System.nanoTime()
    active.filter { q =>
      lastSeen.get(q.id) match {
        case Some((t, _)) => (now - t) / 1000000 > thresholdMs
        case None => false // never progressed: still starting
      }
    }
  }

  def close(): Unit = { spark.streams.removeListener(listener); () }

  private def fmt(m: Metrics): String =
    s"""{"batchId":${m.batchId},"inputRowsPerSecond":${m.inputRowsPerSecond},""" +
      s""""processedRowsPerSecond":${m.processedRowsPerSecond},""" +
      s""""batchDurationMs":${m.batchDurationMs},"numInputRows":${m.numInputRows},""" +
      s""""timestamp":${jstr(m.timestamp)}}"""
  private def jstr(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
