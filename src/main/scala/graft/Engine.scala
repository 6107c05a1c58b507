package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Replaces the reference's cluster bootstrap — Master/Worker/AppMaster actor
  * hierarchy (reference: core/src/main/scala/io/gearpump/cluster/main/Local.scala,
  * cluster/embedded/EmbeddedCluster.scala:29-62): in a Spark-native design the
  * "cluster" is the SparkSession and scheduling/placement belongs to Spark's
  * DAG scheduler, not custom actors.
  *
  * Scale notes (100 TB target):
  *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting means
  *    one static `spark.sql.shuffle.partitions` setting survives 1000x data
  *    growth (partitions re-split at runtime).
  *  - On a real cluster, callers override master/memory via spark-submit conf;
  *    nothing here hard-codes local mode.
  */
object Engine {
  def session(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the engine's own optimizer extensions (idempotent; external callers
    // get the same via spark.sql.extensions=graft.plans.GraftExtensions)
    graft.plans.ProximityJoin.install(spark)
    spark
  }
}
