package graft.streaming

import graft.SparkTestBase
import graft.javaapi.{JavaRunningCount, JavaSessionCount}

/** The Java API mirror of StatefulTask (reference javaapi/Task.java parity)
  * must deliver the exact semantics of the Scala contract: the two Java
  * example tasks (compiled by javac from src/main/java) run through the same
  * StatefulTask.run wiring as RunningCount/ExpiringCount do in
  * StatefulTaskSpec, with matching emissions. */
class JavaStatefulTaskSpec extends SparkTestBase {

  test("Java running counter emits per-update running totals (streaming)") {
    import spark.implicits._
    val in = GraftSource.memory[String](spark)
    val out = StatefulTask.run(in.toDS(), (w: String) => w, new JavaRunningCount)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("java_count").start()
    try {
      in.addData("a", "b", "a")
      q.processAllAvailable()
      in.addData("a")
      q.processAllAvailable()
      val got = spark.table("java_count").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      // state survives across micro-batches: a's second batch continues at 3
      assert(got === Map("a" -> Seq(1L, 2L, 3L), "b" -> Seq(1L)))
    } finally q.stop()
  }

  test("Java session counter stays silent until the watermark fires onExpire") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = GraftSource.memory[(String, java.sql.Timestamp)](spark)
    val withWm = in.toDS().toDF("user", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(String, java.sql.Timestamp)]
    val out = StatefulTask.run(withWm,
      (x: (String, java.sql.Timestamp)) => x._1, new JavaSessionCount)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("java_expire").start()
    try {
      in.addData(("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 10:00:10")),
        ("b", ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      // same cadence as StatefulTaskSpec: the trailing no-data batch fires
      // the long-passed timeouts with each key's final count, exactly once
      val afterB1 = spark.table("java_expire").as[(String, Long)].collect().toSet
      assert(afterB1 === Set(("a", 2L), ("b", 1L)))
      in.addData(("c", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val afterB2 = spark.table("java_expire").as[(String, Long)].collect().toSet
      assert(afterB2 === Set(("a", 2L), ("b", 1L), ("c", 1L)))
    } finally q.stop()
  }
}
