package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operator implementations live in graft.operators.*; this object is
  * just the registry the driver's verify/bench harness consumes. */
object SparkEntry {
  /** Every verifiable operator demonstration, in SURVEY §2 inventory order. */
  def registry: Seq[GraftQuery] =
    operators.Relational.all ++
      operators.EventOps.all ++
      operators.Dedup.all ++
      operators.Similarity.all ++
      operators.TextAnalysis.all ++
      operators.Curation.all ++
      operators.Multimodal.all ++
      operators.PageRank.all ++
      operators.GraphOps.all ++
      operators.Partitioning.all ++
      operators.Skew.all ++
      operators.Sampling.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
