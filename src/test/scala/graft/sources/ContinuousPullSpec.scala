package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** The custom pull-source plugin under Trigger.Continuous: per-record
  * delivery through the SAME ReplayablePullDataSource contract the
  * micro-batch path runs — the execution mode that matches the reference's
  * one-record-at-a-time DataSourceTask forwarding. */
class ContinuousPullSpec extends SparkTestBase {

  test("continuous trigger streams pull-source records per-record, exactly once, and acks epochs") {
    ReplayLedger.reset()
    val pre = (0 until 6).map(i => s"pre-$i")
    pre.zipWithIndex.foreach { case (v, i) => ReplayLedger.append(i % 2, v) }

    val q = spark.readStream
      .format(classOf[ReplayablePullSourceProvider].getName)
      .option("class", classOf[LedgerSource].getName)
      .option("numPartitions", 2)
      .option("continuousPollMs", 2)
      .load()
      .writeStream.format("memory").queryName("cont_pull")
      .trigger(Trigger.Continuous("500 milliseconds"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def seen(): Seq[String] =
        spark.table("cont_pull").select("value").collect().map(_.getString(0)).toSeq
      // pre-filled records arrive without any trigger-aligned batching
      while (seen().size < 6 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen().sorted === pre.sorted, s"got ${seen().sorted}")

      // records appended while the long-running tasks poll arrive too
      val live = (0 until 4).map(i => s"live-$i")
      live.zipWithIndex.foreach { case (v, i) => ReplayLedger.append(i % 2, v) }
      while (seen().size < 10 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen().sorted === (pre ++ live).sorted, "exactly once: no loss, no duplicates")

      // epoch commits ack consumed offsets back to the source (retention trim)
      while ((ReplayLedger.acked.getOrDefault(0, 0L) < 5L ||
              ReplayLedger.acked.getOrDefault(1, 0L) < 5L) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(ReplayLedger.acked.getOrDefault(0, 0L) >= 5L, s"acks: ${ReplayLedger.acked}")
      assert(ReplayLedger.acked.getOrDefault(1, 0L) >= 5L, s"acks: ${ReplayLedger.acked}")
    } finally if (q.isActive) q.stop()
  }
}
