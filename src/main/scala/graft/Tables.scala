package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference has no table concept — payloads are opaque `Any`
  * (reference: core/src/main/scala/io/gearpump/Message.scala:22); here every
  * input is a schema-ful DataFrame so Catalyst can push filters/prune columns
  * down to the parquet scan, which is the whole point of being Spark-native.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The driver's `events` table stores `ts` as parquet TIMESTAMP(NANOS),
    * which Spark 4 refuses to read natively; read it as a nanosecond long
    * and floor-truncate to microseconds — the same truncation DuckDB applies
    * when loading nanos into its microsecond TIMESTAMP, so oracle compares
    * stay exact. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.LongType && f.name == "ts")
        d.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else d
    }
  }

  /** Register all tables as temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
