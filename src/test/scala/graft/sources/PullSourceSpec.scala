package graft.sources

import graft.SparkTestBase
import graft.streaming.GraftSource

/** Deterministic replayable pull source: 7 messages per partition, seekable
  * by batch index (open's startBatch — the reference's startTime replay
  * point). Top-level class: the DSv2 reader instantiates it reflectively on
  * executors, like the reference's TaskLauncher. */
class SevenMessageSource extends PullDataSource {
  private var pid = 0
  private var i = 0
  private var opened = false
  private var closed = false
  def open(partitionId: Int, startBatch: Long): Unit = {
    pid = partitionId
    i = (startBatch * 5).toInt // batchSize used in the spec
    opened = true
  }
  def read(): PullMessage = {
    assert(opened && !closed, "read outside open/close window")
    if (i >= 7) null
    else {
      val m = PullMessage(s"p$pid-m$i", 1700000000000L + i * 1000L)
      i += 1
      m
    }
  }
  def close(): Unit = closed = true
  override def getWatermarkMs: Long = 1700000000000L + i * 1000L
}

class PullSourceSpec extends SparkTestBase {

  test("PullDataSource runs as a micro-batch stream with DataSourceTask batching") {
    import spark.implicits._
    // 2 partitions x 7 messages, batchSize 5 => batch 1 pulls 5/partition,
    // batch 2 pulls the remaining 2 (null ends the batch early), batch
    // indices stop advancing at maxBatches => the drain terminates.
    val df = GraftSource.pull(spark, classOf[SevenMessageSource],
      numPartitions = 2, batchSize = 5, maxBatches = 3)
    assert(df.schema.fieldNames.toSeq === Seq("event_time", "value"))
    val q = df.writeStream.format("memory").queryName("pull_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("pull_out")
        .select($"value", $"event_time".cast("long"))
        .as[(String, Long)].collect().toSet
      val expected = (for (p <- 0 to 1; i <- 0 to 6)
        yield (s"p$p-m$i", 1700000000L + i)).toSet
      assert(rows === expected)
    } finally q.stop()
  }

  test("bounded planning clock stops at maxBatches") {
    val df = GraftSource.pull(spark, classOf[SevenMessageSource],
      numPartitions = 1, batchSize = 100, maxBatches = 1)
    val q = df.writeStream.format("memory").queryName("pull_bounded").start()
    try {
      q.processAllAvailable()
      // one batch of up to 100 reads pulls all 7 then stops on null
      assert(spark.table("pull_bounded").count() === 7)
    } finally q.stop()
  }
}
