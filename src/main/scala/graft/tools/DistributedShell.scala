package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Try

/** Run a shell command once on every executor slot and aggregate the
  * results — parity with the reference's distributed-shell example, where a
  * `ShellExecutor` actor runs the command per executor and the app master
  * folds the `ShellCommandResult`s
  * (/root/reference/examples/distributedshell/src/main/scala/io/gearpump/examples/distributedshell/ShellExecutor.scala:32-41,
  * DistShellAppMaster.scala:63-66).
  *
  * Spark-first shape: one task per requested slot via an evenly-ranged
  * Dataset, the command runs inside `mapPartitions` (the legitimate
  * imperative per-partition escape hatch), and the "aggregator" is just
  * the resulting DataFrame — collect it, or keep slicing it with SQL. */
object DistributedShell {

  final case class ShellResult(
      slot: Int, host: String, exitCode: Int, output: String)

  /** @param slots number of parallel invocations (reference: one per
    *              executor; local mode: one per requested task) */
  def run(spark: SparkSession, command: Seq[String], slots: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, slots.toLong, 1, numPartitions = slots)
      .mapPartitions { it =>
        // one slot id per range element; robust to empty partitions
        it.map { id =>
          val slot = id.toInt
          val host = java.net.InetAddress.getLocalHost.getHostName
          Try {
            val p = new ProcessBuilder(command: _*).redirectErrorStream(true).start()
            val out = new String(p.getInputStream.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            ShellResult(slot, host, p.waitFor(), out.trim)
          }.recover { case e => ShellResult(slot, host, -1, e.getMessage) }.get
        }
      }
      .toDF()
  }

  /** CLI mirror of the reference's DistributedShellClient:
    * `runMain graft.tools.DistributedShell <slots> <command...>` */
  def main(args: Array[String]): Unit = {
    val slots = args.headOption.map(_.toInt).getOrElse(4)
    val cmd = if (args.length > 1) args.drop(1).toSeq else Seq("hostname")
    val spark = graft.Engine.session("graft-dshell", "local[4]")
    run(spark, cmd, slots).show(truncate = false)
    spark.stop()
  }
}
