package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer

import graft.SparkTestBase
import graft.streaming.{GraftSink, GraftSource}
import org.apache.spark.sql.DataFrame

/** Shared "topic" for [[LedgerSource]]: append-only per-partition logs plus
  * the ack ledger — global object so driver planner, executor readers and
  * the spec all see one store (local-mode analog of an external broker). */
object ReplayLedger {
  val logs = new ConcurrentHashMap[Int, ArrayBuffer[String]]()
  val acked = new ConcurrentHashMap[Int, Long]()

  def append(p: Int, v: String): Unit = synchronized {
    logs.computeIfAbsent(p, _ => ArrayBuffer.empty[String]) += v
  }
  def size(p: Int): Long = synchronized {
    Option(logs.get(p)).map(_.size.toLong).getOrElse(0L)
  }
  def get(p: Int, o: Long): String = synchronized { logs.get(p)(o.toInt) }
  def reset(): Unit = synchronized { logs.clear(); acked.clear() }
}

/** Record-offset-addressable source over [[ReplayLedger]] — the Kafka shape
  * the reference's TimeReplayableSource models. Top-level class: the DSv2
  * layers instantiate it reflectively. */
class LedgerSource extends ReplayablePullDataSource {
  def open(partitionId: Int): Unit = ()
  def available(partitionId: Int): Long = ReplayLedger.size(partitionId)
  def read(partitionId: Int, offset: Long): PullMessage =
    PullMessage(ReplayLedger.get(partitionId, offset), 1700000000000L + offset * 1000L)
  def close(): Unit = ()
  override def ack(partitionId: Int, upTo: Long): Unit =
    ReplayLedger.acked.merge(partitionId, upTo, (a, b) => math.max(a, b))
}

object ReplayCollector {
  val byBatch = new ConcurrentHashMap[Long, Set[String]]()
  val failedOnce = new AtomicBoolean(false)
}

class ReplayableSourceSpec extends SparkTestBase {

  test("replayed epoch re-reads the SAME records even after the source grew (exactly-once)") {
    import spark.implicits._
    val ckDir = java.nio.file.Files.createTempDirectory("graft-replay-ck").toString
    ReplayLedger.reset()
    ReplayCollector.byBatch.clear()
    ReplayCollector.failedOnce.set(false)

    for (p <- 0 to 1; i <- 0 until 5) ReplayLedger.append(p, s"p$p-r$i")

    def startQuery() = {
      val stream = GraftSource.replayablePull(spark, classOf[LedgerSource],
        numPartitions = 2, maxRecordsPerTrigger = 3)
      GraftSink.foreachBatchIdempotent(stream.writeStream
        .option("checkpointLocation", ckDir)) { (df: DataFrame, batchId: Long) =>
        val rows = df.select($"value").as[String].collect().toSet
        ReplayCollector.byBatch.put(batchId, rows) // upsert per epoch
        // crash the first attempt of batch 1 AFTER the store write
        if (batchId == 1 && ReplayCollector.failedOnce.compareAndSet(false, true))
          throw new RuntimeException("injected sink crash")
        ()
      }.start()
    }

    val q1 = startQuery()
    val failure = intercept[Exception] { q1.processAllAvailable() }
    assert(failure.getMessage.contains("injected sink crash")
      || Option(failure.getCause).exists(_.getMessage.contains("injected sink crash")))
    q1.stop()

    // records arriving between crash and restart must NOT leak into the
    // replayed epoch (its WAL range is fixed) — the property the
    // batch-index PullDataSource cannot give
    for (p <- 0 to 1) ReplayLedger.append(p, s"p$p-r5")

    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    import scala.jdk.CollectionConverters._
    val store = ReplayCollector.byBatch.asScala
    // batch 0: offsets [0,3); batch 1 (replayed): exactly [3,5) — not r5
    assert(store(0L) === (for (p <- 0 to 1; i <- 0 until 3) yield s"p$p-r$i").toSet)
    assert(store(1L) === (for (p <- 0 to 1; i <- 3 until 5) yield s"p$p-r$i").toSet)
    // late records surface in a NEW epoch
    val all = store.values.flatten.toSeq
    assert(all.size === all.distinct.size, s"duplicate delivery: $all")
    assert(all.toSet === (for (p <- 0 to 1; i <- 0 to 5) yield s"p$p-r$i").toSet)
  }

  test("commit acks offsets back to the source (retention trim) and idle streams quiesce") {
    ReplayLedger.reset()
    for (i <- 0 until 4) ReplayLedger.append(0, s"a$i")
    val df = GraftSource.replayablePull(spark, classOf[LedgerSource], numPartitions = 1)
    val q = df.writeStream.format("memory").queryName("replay_ack").start()
    try {
      q.processAllAvailable() // terminates: available stops growing => no new batch
      assert(spark.table("replay_ack").count() === 4)
      // the engine commits batch N to the source when batch N+1 is
      // constructed — push one more batch so batch 0's ack lands
      for (i <- 4 until 6) ReplayLedger.append(0, s"a$i")
      q.processAllAvailable()
      assert(spark.table("replay_ack").count() === 6)
      val acked = ReplayLedger.acked.get(0)
      assert(acked != null && acked >= 4L, s"batch-0 offsets acked, got $acked")
    } finally q.stop()
  }
}
