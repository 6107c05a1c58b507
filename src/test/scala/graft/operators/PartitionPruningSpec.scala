package graft.operators

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Partition-layout scale posture: a 100 TB corpus is stored
  * hive-partitioned (by date / domain / shard), and the two properties that
  * decide whether a query touches 100 TB or 100 GB are (1) STATIC partition
  * pruning — a literal predicate on the partition column eliminates
  * directories at planning time — and (2) DYNAMIC partition pruning — a
  * selective dimension filter prunes fact partitions at RUNTIME through the
  * join (Spark inserts a dynamicpruning subquery on the fact scan). Both are
  * free with declarative plans; this spec pins them so a refactor can't
  * silently turn a pruned scan into a full-corpus walk. */
class PartitionPruningSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.t(spark, sf, "lineitem")
      .write.partitionBy("l_returnflag").mode("overwrite")
      .parquet(s"$dir/lineitem_part")
    // tiny dimension keyed by the fact's partition column, with a selective
    // attribute to filter on (the date-dim shape of a warehouse)
    spark.createDataFrame(Seq(("A", "keep"), ("N", "drop"), ("R", "drop")))
      .toDF("flag", "disposition")
      .write.mode("overwrite").parquet(s"$dir/flag_dim")
    dir
  }

  test("static pruning: a partition-column literal eliminates directories at plan time") {
    val df = spark.read.parquet(s"$warehouse/lineitem_part")
      .filter(col("l_returnflag") === "R")
      .agg(sum(col("l_quantity")).as("q"))
    val scan = df.queryExecution.executedPlan.toString
    // the `= R` literal must live INSIDE the PartitionFilters segment
    // (directory-level pruning), and the post-scan data filters / pushed
    // parquet filters must not mention l_returnflag at all
    val partFilters = scan.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(partFilters.contains("isnotnull(l_returnflag") &&
      partFilters.contains("= R)"),
      s"expected the literal predicate as a partition filter:\n$scan")
    val nonPartition = scan.linesIterator
      .filterNot(_.contains("PartitionFilters:"))
      .filter(l => l.contains("PushedFilters:") || l.trim.startsWith("+- Filter") ||
        l.trim.startsWith("Filter "))
      .mkString("\n")
    assert(!nonPartition.contains("l_returnflag"),
      s"partition predicate leaked into a post-scan data filter:\n$scan")
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions through the join") {
    val fact = spark.read.parquet(s"$warehouse/lineitem_part")
    val dim = spark.read.parquet(s"$warehouse/flag_dim")
      .filter(col("disposition") === "keep")
    val joined = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the fact scan:\n$planStr")
    // and the pruned result equals the unpruned semantic result
    val viaJoin = joined.collect().head
    val direct = fact.filter(col("l_returnflag") === "A")
      .agg(count(lit(1)), round(sum(col("l_quantity")), 2)).collect().head
    assert(viaJoin.getLong(0) === direct.getLong(0))
    assert(viaJoin.getDouble(1) === direct.getDouble(1))
  }
}
