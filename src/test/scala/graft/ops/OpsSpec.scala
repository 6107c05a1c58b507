package graft.ops

import java.nio.file.Files
import graft.SparkTestBase
import graft.streaming.GraftSource
import org.apache.spark.sql.DataFrame

object RedeployCollector {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
}

class OpsSpec extends SparkTestBase {

  test("applist/appDetail/metrics mirror the REST nouns for a live query") {
    import spark.implicits._
    val reg = new AppRegistry(spark)
    val in = GraftSource.memory[Int](spark)
    val q = in.toDS().writeStream.format("noop").queryName("ops_demo").start()
    try {
      in.addData(1 to 50: _*)
      q.processAllAvailable()
      assert(reg.applist.contains("ops_demo"))
      val detail = reg.appDetail(q.id)
      assert(detail.isDefined && detail.get.contains("\"lastProgress\""))
      assert(reg.metrics.nonEmpty)
      assert(reg.stalling(thresholdMs = 60000).isEmpty)
      // a 0ms threshold marks everything that has progressed as stalling
      assert(reg.stalling(thresholdMs = -1).nonEmpty)
    } finally { q.stop(); reg.close() }
  }

  test("redeploy: stop -> new plan -> restart from same checkpoint, exactly once") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-redeploy-in").toString
    val ckDir = Files.createTempDirectory("graft-redeploy-ck").toString
    RedeployCollector.seen.clear()

    def addFile(from: Long, until: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-stage").toString
      spark.range(from, until).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, java.nio.file.Paths.get(inDir, s"batch-$from.parquet"))
      ()
    }
    def writer(mult: Long) = {
      val stream = spark.readStream
        .schema(spark.range(1).toDF("id").schema).parquet(inDir)
      stream.select(($"id" * mult).as("id")).writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.as[Long].collect().foreach(RedeployCollector.seen.add); ()
        }
    }

    addFile(1, 4)
    val q1 = writer(1).start()
    q1.processAllAvailable()
    // "dynamicdag": replace the x1 stage with an x10 stage, same checkpoint
    addFile(4, 7)
    val q2 = Redeploy.replace(q1, () => writer(10))
    q2.processAllAvailable(); q2.stop()

    import scala.jdk.CollectionConverters._
    // old plan saw 1,2,3; new plan sees only the unprocessed 4,5,6 (x10) —
    // no loss, no reprocessing of the old offsets
    assert(RedeployCollector.seen.asScala.toSeq.sorted === Seq(1L, 2L, 3L, 40L, 50L, 60L))
  }
}
