package graft.api

import org.apache.spark.sql.DataFrame

/** Explicit named-stage DAG with build-time validation — the reference's
  * Graph utility surface (reference: core/src/main/scala/io/gearpump/util/Graph.scala:
  * subGraph :228, replaceVertex :239, topologicalOrderIterator :370,
  * hasCycle :381, hasDuplicatedEdge :389) re-expressed as an immutable
  * builder. The linear `Pipeline.Flow` veneer cannot mis-wire (every `~>`
  * extends a straight line), but a fan-out/fan-in program assembled from
  * parts can: a cycle, a duplicated edge, or a stage with no input would
  * otherwise surface as an opaque Spark analysis error (or a hang) deep
  * inside materialization. `validate()` fails those at graph-build time
  * with the vertex names in the message.
  *
  * Materialization: sources are named external inputs; each stage's input
  * is the `unionByName` fan-in of its incoming edges (each edge applies its
  * partitioner transform first — Pipeline.Edge parity); evaluation is in
  * stable topological order, so `build` IS the reference's
  * `topologicalOrderIterator` walk with DataFrames flowing along edges.
  */
final class StageGraph private (
    sources: Vector[String],
    stages: Vector[Pipeline.Stage],
    edgeList: Vector[(String, Pipeline.Edge, String)]) {

  private def stageNames: Vector[String] = stages.map(_.name)
  /** Insertion-ordered vertex names (sources first). */
  def vertices: Vector[String] = sources ++ stageNames
  def edges: Vector[(String, Pipeline.Edge, String)] = edgeList

  /** Declare an external-input vertex (a table / stream the caller supplies
    * at build time). */
  def addSource(name: String): StageGraph = {
    require(!vertices.contains(name), s"duplicate vertex '$name'")
    new StageGraph(sources :+ name, stages, edgeList)
  }

  /** Declare a transformation vertex. */
  def addStage(stage: Pipeline.Stage): StageGraph = {
    require(!vertices.contains(stage.name), s"duplicate vertex '${stage.name}'")
    new StageGraph(sources, stages :+ stage, edgeList)
  }

  /** Wire `from ~ edge ~> to`. Both vertices must already be declared —
    * unlike the reference's auto-adding addVertexAndEdge, a typo'd name
    * here should fail loudly, not silently create a dangling vertex. */
  def addEdge(from: String, to: String, edge: Pipeline.Edge = Pipeline.LocalEdge): StageGraph = {
    require(vertices.contains(from), s"edge references undeclared vertex '$from'")
    require(vertices.contains(to), s"edge references undeclared vertex '$to'")
    require(!sources.contains(to), s"source '$to' cannot be an edge target")
    new StageGraph(sources, stages, edgeList :+ ((from, edge, to)))
  }

  private def incoming(v: String) = edgeList.filter(_._3 == v)
  private def outgoing(v: String) = edgeList.filter(_._1 == v)

  /** Stable topological order (Kahn's algorithm; ties broken by insertion
    * order — the reference documents its iterator as "stable sorted").
    * Left(cyclic vertices) when a cycle prevents completion. */
  def topologicalSort: Either[Vector[String], Vector[String]] = {
    val order = Vector.newBuilder[String]
    var remaining = vertices
    var live = edgeList
    var progressed = true
    while (remaining.nonEmpty && progressed) {
      val (free, blocked) = remaining.partition(v => !live.exists(_._3 == v))
      progressed = free.nonEmpty
      order ++= free
      remaining = blocked
      live = live.filterNot(e => free.contains(e._1))
    }
    if (remaining.isEmpty) Right(order.result()) else Left(remaining)
  }

  /** Reference hasCycle parity: true when no topological order exists. */
  def hasCycle: Boolean = topologicalSort.isLeft

  /** Reference hasDuplicatedEdge parity: two edges joining the same pair. */
  def hasDuplicatedEdge: Boolean =
    edgeList.groupBy(e => (e._1, e._3)).values.exists(_.size > 1)

  /** Reference subGraph parity: the given vertex plus its direct neighbours
    * and every edge touching it. */
  def subGraph(name: String): StageGraph = {
    require(vertices.contains(name), s"unknown vertex '$name'")
    val touching = edgeList.filter(e => e._1 == name || e._3 == name)
    val keep = (touching.flatMap(e => Vector(e._1, e._3)) :+ name).distinct
    new StageGraph(sources.filter(keep.contains),
      stages.filter(s => keep.contains(s.name)), touching)
  }

  /** Reference replaceVertex parity: swap a stage's transform in place —
    * incoming and outgoing edges rewire to the new stage's name. */
  def replaceVertex(name: String, replacement: Pipeline.Stage): StageGraph = {
    require(stageNames.contains(name), s"unknown stage '$name'")
    require(name == replacement.name || !vertices.contains(replacement.name),
      s"duplicate vertex '${replacement.name}'")
    val rewired = edgeList.map { case (f, e, t) =>
      (if (f == name) replacement.name else f, e, if (t == name) replacement.name else t)
    }
    new StageGraph(sources,
      stages.map(s => if (s.name == name) replacement else s), rewired)
  }

  /** Build-time validation: every defect a mis-wired program can carry,
    * reported with vertex names BEFORE any Spark plan is constructed. */
  def validate(): Unit = {
    topologicalSort.left.foreach(cyclic => throw new IllegalArgumentException(
      s"pipeline graph has a cycle through: ${cyclic.mkString(", ")}"))
    if (hasDuplicatedEdge) {
      val dups = edgeList.groupBy(e => (e._1, e._3)).collect {
        case ((f, t), es) if es.size > 1 => s"$f->$t"
      }
      throw new IllegalArgumentException(
        s"duplicated edges: ${dups.mkString(", ")}")
    }
    val orphaned = stageNames.filter(incoming(_).isEmpty)
    if (orphaned.nonEmpty) throw new IllegalArgumentException(
      s"stages with no input edge: ${orphaned.mkString(", ")}")
  }

  /** Materialize: validate, then fold DataFrames through the DAG in
    * topological order. Returns every vertex's output (callers typically
    * read the sink vertices). */
  def build(inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    validate()
    val missing = sources.filterNot(inputs.contains)
    require(missing.isEmpty, s"missing inputs for sources: ${missing.mkString(", ")}")
    val stageByName = stages.map(s => s.name -> s).toMap
    val order = topologicalSort.toOption.get
    order.foldLeft(Map.empty[String, DataFrame]) { (acc, v) =>
      if (sources.contains(v)) acc + (v -> inputs(v))
      else {
        val fanIn = incoming(v).map { case (from, edge, _) => edge(acc(from)) }
          .reduce(_ unionByName _)
        acc + (v -> stageByName(v).f(fanIn))
      }
    }
  }

  /** Sink vertices (no outgoing edges) — what a program usually consumes. */
  def sinks: Vector[String] = vertices.filter(outgoing(_).isEmpty)
}

object StageGraph {
  def empty: StageGraph = new StageGraph(Vector.empty, Vector.empty, Vector.empty)
}
