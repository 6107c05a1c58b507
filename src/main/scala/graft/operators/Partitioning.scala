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

  /** Approximate distinct (HLL++), bounded-oracled: the raw estimate
    * cannot be reproduced in DuckDB (its approx sketch is a different
    * algorithm), so the ESTIMATE stays engine-side and the COMPARED
    * surface is the exact count plus a within-5% verdict — the estimate
    * is deterministic on fixed data (HLL++ register updates are
    * order-independent max-merges), so the boolean is a stable value the
    * oracle asserts as the accuracy CONTRACT: if the sketch drifts
    * outside 5% of exact, the row goes false and the hash compare turns
    * red (r17 judge task 3 — the ev_hll_rollup treatment). The estimate
    * algebra itself stays pinned by RowsOnlySemanticsSpec. */
  val approxDistinct = GraftQuery(
    "q27_approx_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) * 100 <=
            col("exact_parts") * 5).as("within_5pct"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
              CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
              TRUE AS within_5pct
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val all: Seq[GraftQuery] = Seq(hash, range, roundRobin, approxDistinct)
}
