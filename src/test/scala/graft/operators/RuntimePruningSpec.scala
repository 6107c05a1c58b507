package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the runtime half of the pushdown story.
  * Static pruning (PushedFilters, pinned in PlanInvariantsSpec) only fires
  * when the filter sits on the fact table; at 100 TB the common case is a
  * filter on a DIMENSION that reaches the fact through a join, and the
  * engine must translate it into fact-partition skips AT RUNTIME (DPP).
  * This spec lays the fact out partitioned by its date key (the layout a
  * real warehouse uses), joins through a filtered dim, and pins that the
  * fact scan carries a dynamicpruning partition filter and actually reads
  * only the matching partition's rows. */
class RuntimePruningSpec extends SparkTestBase {

  test("a dim-side filter prunes fact partitions through the join at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // fact: orders partitioned by order year (3 year-partitions at sf0.001)
    Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val fact = spark.read.parquet(dir)
    val years = fact.select(col("o_year")).distinct().count()
    assert(years >= 3, s"need multiple partitions for pruning to matter, got $years")

    // dim: a year dimension filtered to ONE year — the filter never touches
    // the fact directly, only through the join key. The dim is a parquet
    // relation (not a LocalRelation) because DPP's benefit estimation
    // wants a real filtering-side scan with a selective predicate.
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    (1995 to 2001).map(y => (y, s"fy$y")).toDF("dim_year", "fiscal")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("fiscal") === "fy1996")
    val joined = fact.join(dim, col("o_year") === col("dim_year"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
    val n = joined.collect()(0).getLong(0)

    val expected = Tables.t(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(n === expected, "pruned result must still be complete for the kept year")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a runtime partition filter:\n$plan")
    // and the scan's partition filter is on o_year — not a full-table read
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"partition filter missing from the fact scan:\n$plan")
  }
}
