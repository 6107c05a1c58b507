package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The files surface beyond parquet: ORC, CSV, and JSON round-trip the
  * same relational data bit-identically, and ORC — the other columnar
  * format a 100 TB lake realistically serves — gets the same predicate
  * pushdown treatment as parquet (PushedFilters on the scan). The
  * reference's file source/sink is line-oriented HDFS text; this engine
  * inherits every Spark format as both batch source and sink, which is
  * the §2.2 parity claim this spec pins. */
class FormatParitySpec extends SparkTestBase {

  test("orc/csv/json round-trip parquet data identically; orc pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val base = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
    val want = base.orderBy(col("o_orderkey")).collect().toSeq

    base.write.mode("overwrite").orc(s"$dir/o.orc")
    base.write.mode("overwrite").option("header", "true").csv(s"$dir/o.csv")
    base.write.mode("overwrite").json(s"$dir/o.json")

    val orc = spark.read.orc(s"$dir/o.orc")
    assert(orc.orderBy(col("o_orderkey")).collect().toSeq == want, "orc round-trip")
    // csv/json are text formats: read back through the SAME schema so types
    // match, then values must agree exactly (doubles survive — Spark writes
    // round-trippable representations)
    val csv = spark.read.schema(base.schema).option("header", "true").csv(s"$dir/o.csv")
    assert(csv.orderBy(col("o_orderkey")).collect().toSeq == want, "csv round-trip")
    val json = spark.read.schema(base.schema).json(s"$dir/o.json")
    assert(json.orderBy(col("o_orderkey")).collect().toSeq == want, "json round-trip")

    // ORC scans take pushdown like parquet: the filter must reach the scan
    val q = orc.filter(col("o_orderkey") === 42L).select(col("o_totalprice"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)"),
      s"orc scan must carry the pushed filter:\n$plan")
  }

  test("streaming reads the same files surface: an orc directory streams batch-identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt-stream").toString
    val base = Tables.t(spark, sf, "nation")
    base.write.mode("overwrite").orc(dir)
    val stream = spark.readStream.schema(base.schema).orc(dir)
    val q = stream.writeStream.format("memory").queryName("fmt_orc_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("fmt_orc_stream")
        .as[(Int, String, Int)].collect().sortBy(_._1).toSeq
      val want = base.as[(Int, String, Int)].collect().sortBy(_._1).toSeq
      assert(got == want, "orc stream must equal the batch read")
    } finally q.stop()
  }
}
