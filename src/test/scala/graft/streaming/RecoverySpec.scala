package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

object RecoveryCollector {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
}

/** Delivery-semantics parity (SURVEY §2.9): the reference recovers by
  * checkpoint + source replay from the min clock
  * (reference: docs/contents/internals/gearpump-internals.md:132-187,
  * appmaster/ClockService.scala:315-321); Spark's equivalent is the WAL
  * offset log in checkpointLocation. Kill the query, add more input,
  * restart from the same checkpoint: every record exactly once. */
class RecoverySpec extends SparkTestBase {

  test("restart from checkpoint neither loses nor duplicates records") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-in").toString
    val ckDir = Files.createTempDirectory("graft-ck").toString
    RecoveryCollector.seen.clear()

    def startQuery() = {
      val stream = spark.readStream
        .schema(spark.range(1).toDF("id").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
      stream.writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.as[Long].collect().foreach(RecoveryCollector.seen.add); ()
        }
        .start()
    }

    // the file source lists files at the top level: write each batch
    // elsewhere, then move its part-file into inDir
    def addFile(from: Long, until: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-stage").toString
      spark.range(from, until).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, java.nio.file.Paths.get(inDir, s"batch-$from.parquet"))
      ()
    }

    addFile(1, 6)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop() // "executor crash"

    addFile(6, 11)
    val q2 = startQuery() // recovery: same checkpoint, replays only unseen offsets
    q2.processAllAvailable(); q2.stop()

    import scala.jdk.CollectionConverters._
    assert(RecoveryCollector.seen.asScala.toSeq.sorted === (1L to 10L))
  }
}
