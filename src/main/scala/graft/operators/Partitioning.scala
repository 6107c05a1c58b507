package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioner parity (SURVEY §2.3): the reference routes every message
  * through an edge Partitioner
  * (reference: streaming/src/main/scala/io/gearpump/streaming/partitioner/Partitioner.scala:25-62);
  * Spark's equivalents are plan-level partitionings. Each query materializes
  * the resulting distribution via spark_partition_id() so the routing
  * behavior is observable (no SQL oracle — DuckDB has no partition concept;
  * distribution *properties* are asserted in PartitioningSpec).
  *
  * Mapping (reference file -> Spark):
  *  - HashPartitioner.scala:24-28            -> repartition(n, col) [hash]
  *  - GroupByPartitioner.scala:36-41         -> groupBy/repartition by key expr
  *  - ShufflePartitioner.scala:23-38         -> repartition(n) [round-robin]
  *  - ShuffleGroupingPartitioner.scala:25-39 -> repartition(n) [same guarantee]
  *  - BroadcastPartitioner.scala:20-31       -> broadcast() join hint
  *  - CoLocationPartitioner.scala:23-26      -> narrow chaining (one stage)
  */
object Partitioning {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** Hash partitioning: same key -> same partition, observably grouped. */
  val hash = GraftQuery(
    "part_hash_distribution",
    (s, dir) =>
      t(s, dir, "events")
        .repartition(16, col("user_id"))
        .select(spark_partition_id().as("pid"), col("user_id"))
        .groupBy(col("pid"))
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("user_id")).as("n_keys"))
        .orderBy(col("pid")),
    None)

  /** Range partitioning: ordered, non-overlapping key ranges per partition. */
  val range = GraftQuery(
    "part_range_distribution",
    (s, dir) =>
      t(s, dir, "orders")
        .repartitionByRange(8, col("o_orderdate"))
        .select(spark_partition_id().as("pid"), col("o_orderdate"))
        .groupBy(col("pid"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_orderdate")).as("range_min"), max(col("o_orderdate")).as("range_max"))
        .orderBy(col("pid")),
    None)

  /** Round-robin (ShufflePartitioner parity): near-equal partition sizes. */
  val roundRobin = GraftQuery(
    "part_roundrobin_distribution",
    (s, dir) =>
      t(s, dir, "events")
        .repartition(16)
        .groupBy(spark_partition_id().as("pid"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("pid")),
    None)

  /** Approximate distinct (HLL++) — no oracle: DuckDB's approx sketch is a
    * different algorithm; the exact counterpart is verified in q16_distinct. */
  val approxDistinct = GraftQuery(
    "q27_approx_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy(col("l_returnflag")),
    None)

  val all: Seq[GraftQuery] = Seq(hash, range, roundRobin, approxDistinct)
}
