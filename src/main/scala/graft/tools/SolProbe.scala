package graft.tools

import graft.Engine
import graft.streaming.GraftSource

/** SOL throughput prober: run the rate->project->noop pass-through at one or
  * more requested generation rates and print the peak processed rows/s.
  * Finds the saturation point of the SOL-equivalent pipeline (BASELINE.md) —
  * the rate ask must exceed engine capacity or the measurement reports the
  * generator's speed, not the engine's.
  *
  * Usage: graft.tools.SolProbe [rate1,rate2,...] [secondsPerRate]
  */
object SolProbe {
  def main(args: Array[String]): Unit = {
    val rates = args.headOption.getOrElse("20000000")
      .split(",").toSeq.map(_.toLong)
    val secs = if (args.length > 1) args(1).toInt else 12
    val fixedBatch = args.length > 2 && args(2) == "fixed"
    val spark = Engine.session("sol-probe")
    rates.foreach { r =>
      val src =
        if (fixedBatch) GraftSource.rateFixedBatch(spark, rowsPerBatch = r, payloadBytes = 100)
        else GraftSource.rate(spark, rowsPerSecond = r, payloadBytes = 100)
      val q = src.writeStream.format("noop").start()
      Thread.sleep(secs * 1000L)
      val obs = q.recentProgress.map(_.processedRowsPerSecond).filterNot(_.isNaN)
      q.stop()
      val peak = if (obs.nonEmpty) obs.max.toLong else 0L
      println(s"rate=$r peak=$peak batches=${obs.map(_.toLong).mkString(",")}")
    }
    spark.stop()
  }
}
