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

class StatefulTaskSpec extends SparkTestBase {

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
