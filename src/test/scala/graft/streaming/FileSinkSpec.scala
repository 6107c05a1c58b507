package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Streaming file sink (SURVEY §2.2 HDFS parity): parquet out with the
  * `_spark_metadata` transaction log — the sink-side half of exactly-once
  * (the reference reaches the same guarantee with checkpointed offset +
  * state alignment, docs/contents/internals/gearpump-internals.md:132-187).
  * Restarting from the same checkpoint must neither lose nor duplicate
  * rows in the committed output. */
class FileSinkSpec extends SparkTestBase {

  test("parquet file sink is exactly-once across a restart") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-fsin").toString
    val outDir = Files.createTempDirectory("graft-fsout").toString
    val ckDir = Files.createTempDirectory("graft-fsck").toString

    def addFile(from: Long, until: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-fsstage").toString
      spark.range(from, until).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(inDir, s"batch-$from.parquet"))
      ()
    }

    def startQuery() =
      spark.readStream
        .schema(spark.range(1).toDF("id").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .start()

    addFile(1, 6)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    addFile(6, 11)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    // read through the _spark_metadata log: committed rows, exactly once
    val got = spark.read.parquet(outDir).as[Long].collect().toSeq.sorted
    assert(got === (1L to 10L))
    assert(Files.exists(Paths.get(outDir, "_spark_metadata")),
      "file sink should commit through the metadata log")
  }
}
