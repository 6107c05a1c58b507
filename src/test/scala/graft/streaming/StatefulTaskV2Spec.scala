package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase

/** StatefulTask.runV2 = the same PersistentTask contract on Spark's state-v2
  * API (transformWithState): ValueState survives micro-batches, explicit
  * event-time timers reproduce the onExpire lifecycle, and expired state is
  * cleared. State-v2 requires the RocksDB provider, so the spec runs on it
  * (doubling as the 100 TB-posture check for the new API). */
class StatefulTaskV2Spec extends SparkTestBase {

  private def withRocksDB[T](body: String => T): T = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body(Files.createTempDirectory("graft-tws-ck").toString)
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("keyed ValueState persists across micro-batches") {
    import spark.implicits._
    withRocksDB { ck =>
      val in = GraftSource.memory[(String, Int)](spark)
      val out = StatefulTask.runV2(in.toDS(), (x: (String, Int)) => x._1, new RunningCount)
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("tws_out").start()
      try {
        in.addData(("a", 1), ("b", 2))
        q.processAllAvailable()
        in.addData(("a", 3))
        q.processAllAvailable()
        val emitted = spark.table("tws_out").as[(String, Long)].collect().toSet
        assert(emitted === Set(("a", 1L), ("b", 2L), ("a", 4L)))
      } finally q.stop()
    }
  }

  test("event-time timer fires onExpire and clears state") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    withRocksDB { ck =>
      val in = GraftSource.memory[(String, java.sql.Timestamp)](spark)
      val withWm = in.toDS().toDF("user", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(String, java.sql.Timestamp)]
      val out = StatefulTask.runV2(withWm, (x: (String, java.sql.Timestamp)) => x._1,
        new ExpiringCount)
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .format("memory").queryName("tws_expire").start()
      try {
        in.addData(("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 10:00:10")),
          ("b", ts("2024-01-01 10:00:30")))
        q.processAllAvailable()
        assert(spark.table("tws_expire").as[(String, Long)].collect().toSet ===
          Set(("a", 2L), ("b", 1L)))
        // expired state was cleared: new 'a' data restarts from init
        in.addData(("a", ts("2024-01-01 10:20:00")))
        q.processAllAvailable()
        in.addData(("z", ts("2024-01-01 11:00:00"))) // push watermark past a's timer
        q.processAllAvailable()
        val all = spark.table("tws_expire").as[(String, Long)].collect().toList.sorted
        assert(all.count(_ == ("a", 1L)) === 1, s"expected a fresh a->1 expiry, got $all")
      } finally q.stop()
    }
  }
}
