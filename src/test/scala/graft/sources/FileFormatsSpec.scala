package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** §2.2 "Files batch+streaming" across formats: the reference stores
  * jars/checkpoints on DFS (gearpump-hadoop DFSJarStore) but has no
  * format-aware file IO at all — the engine inherits Spark's full file
  * surface. This spec pins csv/json/orc round-trips (schema + values) and
  * the streaming file source (json files arriving in a directory feed a
  * watermark + window aggregate). */
class FileFormatsSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fmt").toString

  test("csv/json/orc round-trip a query result with schema intact") {
    import spark.implicits._
    val df = graft.Tables.t(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val expected = df.as[(Long, String, Long)].collect().toSet
    for (fmt <- Seq("csv", "json", "orc")) {
      val dir = s"${tmp()}/$fmt"
      df.write.format(fmt).option("header", "true").save(dir)
      val back = spark.read.format(fmt)
        .option("header", "true").option("inferSchema", "true")
        .schema(df.schema) // deterministic: declared, not inferred
        .load(dir)
      assert(back.as[(Long, String, Long)].collect().toSet === expected,
        s"$fmt round-trip diverged")
    }
  }

  test("streaming file source: json files land in a directory, window agg sees them") {
    import spark.implicits._
    val inDir = tmp()
    val schema = "ts TIMESTAMP, user_id LONG, v DOUBLE"
    val stream = spark.readStream.schema(schema).json(inDir)
    val q = graft.streaming.Windows.tumbling(stream, "ts", "10 seconds")
      .agg(Seq.empty, count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("window.start").cast("long").as("w"), col("n"), col("s"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("file_stream_out").start()
    try {
      def drop(name: String, rows: Seq[String]): Unit = {
        val p = java.nio.file.Paths.get(inDir, name)
        java.nio.file.Files.writeString(p, rows.mkString("\n"))
      }
      drop("b0.json", Seq(
        """{"ts":"2024-01-01 00:00:01","user_id":1,"v":1.5}""",
        """{"ts":"2024-01-01 00:00:05","user_id":2,"v":2.5}"""))
      q.processAllAvailable()
      drop("b1.json", Seq(
        """{"ts":"2024-01-01 00:00:15","user_id":1,"v":4.0}"""))
      q.processAllAvailable()
      val got = spark.table("file_stream_out").as[(Long, Long, Double)]
        .collect().sortBy(_._1).toSeq
      assert(got.map(_._2) === Seq(2L, 1L), s"window counts: $got")
      assert(got.map(_._3) === Seq(4.0, 4.0), s"window sums: $got")
    } finally q.stop()
  }
}
