package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Gearpump-shaped program veneer: `source ~> stage ~ edge ~> stage ~> sink`.
  *
  * The reference wires a `Graph[Processor, Partitioner]` with `~>` / `~ edge ~>`
  * syntax (reference: core/src/main/scala/io/gearpump/util/Graph.scala:458-521;
  * example: examples/streaming/wordcount/.../WordCount.scala:36-48) that the
  * AppMaster turns into actor placement. Here the same surface composes
  * DataFrame transforms — the "DAG" is the Catalyst plan (SURVEY §2.1 #5),
  * fan-out is reusing a stage, fan-in is `union`. Pure sugar: zero execution
  * code lives in this file.
  */
object Pipeline {

  /** A named transformation stage — the Processor analog
    * (reference: streaming/src/main/scala/io/gearpump/streaming/Processor.scala:25-49).
    * Parallelism lives on the EDGES (HashEdge/ShuffleEdge carry the
    * partition count), not here; narrow stages chain in one Spark stage
    * (CoLocation parity). */
  final case class Stage(name: String, f: DataFrame => DataFrame)

  /** Edge partitioners (reference: streaming/.../partitioner/Partitioner.scala:25-62).
    * Each is a plan transformation applied between stages. */
  sealed trait Edge { def apply(df: DataFrame): DataFrame }
  /** HashPartitioner parity (reference: partitioner/HashPartitioner.scala:24-28). */
  final case class HashEdge(n: Int, keys: Seq[String]) extends Edge {
    def apply(df: DataFrame): DataFrame = df.repartition(n, keys.map(col): _*)
  }
  /** ShufflePartitioner / ShuffleGrouping parity (round-robin,
    * reference: partitioner/ShufflePartitioner.scala:23-38). */
  final case class ShuffleEdge(n: Int) extends Edge {
    def apply(df: DataFrame): DataFrame = df.repartition(n)
  }
  /** BroadcastPartitioner parity (reference: partitioner/BroadcastPartitioner.scala:20-31):
    * marks the flowing relation as broadcastable for its next join. */
  case object BroadcastEdge extends Edge {
    def apply(df: DataFrame): DataFrame = broadcast(df)
  }
  /** CoLocation parity (reference: partitioner/CoLocationPartitioner.scala:23-26):
    * no redistribution — Spark pipelines narrow stages automatically. */
  case object LocalEdge extends Edge {
    def apply(df: DataFrame): DataFrame = df
  }

  /** A flowing pipeline: the current DataFrame plus a pending edge. */
  final class Flow private[Pipeline] (val df: DataFrame,
      private[Pipeline] val pendingEdge: Edge) {
    /** attach a partitioner to the *next* `~>` hop: `flow ~ edge ~> stage`. */
    def ~(edge: Edge): Flow = new Flow(df, edge)
    /** wire the next stage through the pending edge. */
    def ~>(stage: Stage): Flow = new Flow(stage.f(pendingEdge(df)), LocalEdge)
    def ~>(f: DataFrame => DataFrame): Flow = ~>(Stage("stage", f))
    /** fan-in (the reference's multi-edge interleave,
      * reference: examples/streaming/complexdag/.../Dag.scala:77-93). */
    def merge(other: Flow): Flow = {
      // apply BOTH sides' pending edges before the union: silently
      // discarding a `~`-declared repartition/broadcast would drop the
      // program's stated partitioning (r15 facade review)
      new Flow(pendingEdge(df).unionByName(other.pendingEdge(other.df)),
        LocalEdge)
    }
    def toDF: DataFrame = df
  }

  def from(df: DataFrame): Flow = new Flow(df, LocalEdge)
  def from(spark: SparkSession, dir: String, table: String): Flow =
    new Flow(graft.Tables.t(spark, dir, table), LocalEdge)
}
