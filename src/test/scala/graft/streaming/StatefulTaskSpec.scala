package graft.streaming

import graft.SparkTestBase

/** StatefulTask = the PersistentTask recipe over flatMapGroupsWithState:
  * state must survive across micro-batches (the reference's
  * recover/update/checkpoint lifecycle, state/api/PersistentTask.scala:36-98). */
/** Running keyed counter — wordcount `Sum`'s HashMap state
  * (reference: examples/streaming/wordcount/.../Sum.scala:27-46) as managed
  * state. Top-level so the closure doesn't capture the test suite. */
class RunningCount extends StatefulTask[String, (String, Int), Long, (String, Long)] {
  def init: Long = 0L
  def update(key: String, state: Long, in: (String, Int)): (Long, Iterator[(String, Long)]) = {
    val s = state + in._2
    (s, Iterator((key, s)))
  }
  def onExpire(key: String, state: Long): Iterator[(String, Long)] = Iterator.empty
}

/** Session-style accumulator that stays silent on update and emits only from
  * `onExpire` — the reference's onWatermarkProgress-driven emission
  * (reference: streaming/src/main/scala/io/gearpump/streaming/task/Task.scala:160-166,
  * checkpoint-on-watermark at state/api/PersistentTask.scala:81-90). */
class ExpiringCount extends StatefulTask[String, (String, java.sql.Timestamp), Long, (String, Long)] {
  def init: Long = 0L
  def update(key: String, state: Long, in: (String, java.sql.Timestamp)): (Long, Iterator[(String, Long)]) =
    (state + 1, Iterator.empty)
  def onExpire(key: String, state: Long): Iterator[(String, Long)] = Iterator((key, state))
  override def timeoutMs: Long = 60000L
}

class StatefulTaskSpec extends SparkTestBase {

  test("onExpire fires when the event-time watermark passes the timeout") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = GraftSource.memory[(String, java.sql.Timestamp)](spark)
    val withWm = in.toDS().toDF("user", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(String, java.sql.Timestamp)]
    val out = StatefulTask.run(withWm, (x: (String, java.sql.Timestamp)) => x._1, new ExpiringCount)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("expire_out").start()
    try {
      // batch 1: a/b are scheduled against the pre-batch watermark (epoch),
      // the data batch advances the watermark to 10:00:30, and the trailing
      // no-data micro-batch fires their (long-passed) timeouts -> both
      // expire with their FINAL state, exactly once, nothing emitted earlier
      in.addData(("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 10:00:10")),
        ("b", ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      val afterB1 = spark.table("expire_out").as[(String, Long)].collect().toSet
      assert(afterB1 === Set(("a", 2L), ("b", 1L)))
      // batch 2: c's timeout = wm(10:00:30) + 60s = 10:01:30; the batch
      // advances the watermark to 10:05:00, which passes it -> c expires
      in.addData(("c", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val afterB2 = spark.table("expire_out").as[(String, Long)].collect().toSet
      assert(afterB2 === Set(("a", 2L), ("b", 1L), ("c", 1L)))
      // expired state was removed: more 'a' data restarts the count from
      // init rather than resuming the removed state
      in.addData(("a", ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      val afterB3 = spark.table("expire_out").as[(String, Long)].collect().toList.sorted
      assert(afterB3 === List(("a", 1L), ("a", 2L), ("b", 1L), ("c", 1L)))
    } finally q.stop()
  }

  test("keyed state persists across micro-batches") {
    import spark.implicits._
    val in = GraftSource.memory[(String, Int)](spark)
    val out = StatefulTask.run(in.toDS(), (x: (String, Int)) => x._1, new RunningCount)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("task_out").start()
    try {
      in.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      in.addData(("a", 3))
      q.processAllAvailable()
      val emitted = spark.table("task_out").as[(String, Long)].collect().toSet
      // batch1 emits a->1, b->2; batch2 emits a->4 (state carried over)
      assert(emitted === Set(("a", 1L), ("b", 2L), ("a", 4L)))
    } finally q.stop()
  }

  test("works in batch mode too (state scoped to the single batch)") {
    import spark.implicits._
    val ds = Seq(("x", 1), ("x", 2), ("y", 5)).toDS()
    val out = StatefulTask.run(ds, (x: (String, Int)) => x._1, new RunningCount)
      .collect().toSet
    assert(out === Set(("x", 1L), ("x", 3L), ("y", 5L)))
  }
}
