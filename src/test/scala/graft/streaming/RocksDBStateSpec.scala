package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase

/** The disk-backed state store option (SURVEY §2.1 #13: the reference's
  * CheckpointStore is pluggable; Spark's analog is the state store provider).
  * RocksDB is the 100 TB posture — keyed state beyond executor heap — and
  * this spec proves the engine's stateful recipe runs unchanged on it. */
class RocksDBStateSpec extends SparkTestBase {

  test("StatefulTask state survives micro-batches on the RocksDB provider") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ck = Files.createTempDirectory("graft-rocks-ck").toString
    try {
      val in = GraftSource.memory[(String, Int)](spark)
      val out = StatefulTask.run(in.toDS(), (x: (String, Int)) => x._1, new RunningCount)
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("rocks_out").start()
      try {
        in.addData(("a", 1), ("b", 2))
        q.processAllAvailable()
        in.addData(("a", 3))
        q.processAllAvailable()
        val emitted = spark.table("rocks_out").as[(String, Long)].collect().toSet
        assert(emitted === Set(("a", 1L), ("b", 2L), ("a", 4L)))
        // the checkpoint actually used RocksDB (sst/log layout under state/)
        val stateDir = new java.io.File(s"$ck/state")
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        assert(walk(stateDir).exists(f => f.getName.endsWith(".zip") || f.getName.endsWith(".sst")
          || f.getPath.contains("RocksDB") || f.getName.endsWith(".changelog")),
          s"expected RocksDB artifacts under $stateDir")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
