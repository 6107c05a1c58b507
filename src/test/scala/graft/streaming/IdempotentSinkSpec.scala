package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

object IdempotentCollector {
  /** epoch-keyed store: upsert per batchId — the idempotent-commit shape. */
  val byBatch = new ConcurrentHashMap[Long, Seq[Long]]()
  val failedOnce = new AtomicBoolean(false)
}

/** The exactly-once sink recipe under an actual failure: a batch commit
  * crashes after partially "writing", the query dies, and the restart
  * replays the same epoch — because the store is keyed by batchId the
  * replay overwrites instead of appending (the reference reaches the same
  * guarantee by aligning checkpoints with source replay,
  * docs/contents/internals/gearpump-internals.md:132-187). */
class IdempotentSinkSpec extends SparkTestBase {

  test("a crashed batch replays with the same epoch id and commits exactly once") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-idem-in").toString
    val ckDir = Files.createTempDirectory("graft-idem-ck").toString
    IdempotentCollector.byBatch.clear()
    IdempotentCollector.failedOnce.set(false)

    def addFile(from: Long, until: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-idem-stage").toString
      spark.range(from, until).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(inDir, s"batch-$from.parquet"))
      ()
    }

    def startQuery() = {
      val stream = spark.readStream
        .schema(spark.range(1).toDF("id").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
      GraftSink.foreachBatchIdempotent(stream.writeStream
        .option("checkpointLocation", ckDir)) { (df: DataFrame, batchId: Long) =>
        val rows = df.as[Long].collect().toSeq
        // idempotent commit: upsert by epoch
        IdempotentCollector.byBatch.put(batchId, rows)
        // crash AFTER the store mutation on the first attempt of batch 1 —
        // a replayed non-idempotent append would double these rows
        if (batchId == 1 && IdempotentCollector.failedOnce.compareAndSet(false, true))
          throw new RuntimeException("injected sink crash")
        ()
      }.start()
    }

    addFile(1, 6)
    addFile(6, 11)
    val q1 = startQuery()
    val failure = intercept[Exception] { q1.processAllAvailable() }
    assert(failure.getMessage.contains("injected sink crash")
      || Option(failure.getCause).exists(_.getMessage.contains("injected sink crash")))
    q1.stop()

    val q2 = startQuery() // same checkpoint -> batch 1 replays, same epoch id
    q2.processAllAvailable(); q2.stop()

    import scala.jdk.CollectionConverters._
    val all = IdempotentCollector.byBatch.asScala.values.flatten.toSeq.sorted
    assert(all === (1L to 10L), s"exactly once after replay, got $all")
    assert(IdempotentCollector.byBatch.size === 2)
  }
}
