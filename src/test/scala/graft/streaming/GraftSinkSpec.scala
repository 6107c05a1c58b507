package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import graft.SparkTestBase

object CollectingSink {
  val rows = new ConcurrentLinkedQueue[Long]()
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  def reset(): Unit = { rows.clear(); opens.set(0); closes.set(0) }
}

/** Top-level so serialization doesn't drag the test suite along. */
class TestSink extends GraftSink[Long] {
  def openSink(partitionId: Long, epochId: Long): Unit = { CollectingSink.opens.incrementAndGet(); () }
  def write(value: Long): Unit = { CollectingSink.rows.add(value); () }
  def closeSink(errorOrNull: Throwable): Unit = { CollectingSink.closes.incrementAndGet(); () }
}

/** The open/write/close sink contract
  * (reference: streaming/src/main/scala/io/gearpump/streaming/sink/DataSink.scala:40-61)
  * mapped onto ForeachWriter: every partition/epoch opens once, writes its
  * rows, closes once — observed through a shared collector (local[*] = one JVM). */
class GraftSinkSpec extends SparkTestBase {

  test("sink receives every row exactly once with paired open/close") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    CollectingSink.reset()
    val in = GraftSource.memory[Long](spark)
    val q = in.toDS().writeStream.foreach(new TestSink).start()
    try {
      in.addData(1L to 100L: _*)
      q.processAllAvailable()
      assert(CollectingSink.rows.asScala.toSeq.sorted === (1L to 100L))
      assert(CollectingSink.opens.get() > 0)
      assert(CollectingSink.opens.get() === CollectingSink.closes.get())
    } finally q.stop()
  }
}
