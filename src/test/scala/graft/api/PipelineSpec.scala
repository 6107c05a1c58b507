package graft.api

import graft.SparkTestBase
import graft.api.Pipeline._
import org.apache.spark.sql.functions._

/** The Gearpump-shaped veneer must compose to exactly the same results as
  * direct DataFrame code, and its edges must map to the documented
  * partitionings (SURVEY §2.3). */
class PipelineSpec extends SparkTestBase {

  test("wordcount via source ~> split ~ hash-edge ~> count matches oracle") {
    import spark.implicits._
    val lines = Seq("the quick brown fox", "the lazy dog", "the end").toDF("line")
    val split_ = Stage("split", _.select(explode(split(col("line"), " ")).as("word")))
    val count_ = Stage("sum", _.groupBy("word").count())
    val got = (Pipeline.from(lines)
      ~> split_
      ~ HashEdge(4, Seq("word"))
      ~> count_).toDF
      .as[(String, Long)].collect().toMap
    val expected = "the quick brown fox the lazy dog the end".split(" ")
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got === expected)
  }

  test("edges apply the documented partitionings") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
    assert(ShuffleEdge(5)(df).rdd.getNumPartitions === 5)
    val hashed = HashEdge(8, Seq("x"))(df)
    assert(hashed.rdd.getNumPartitions === 8)
    // hash partitioning co-locates equal keys: each key in exactly 1 partition
    val spread = hashed.select(spark_partition_id().as("p"), col("x"))
      .groupBy("x").agg(countDistinct("p").as("n"))
      .agg(max("n")).as[Long].head()
    assert(spread === 1L)
  }

  test("fan-in merge unions branches (complexdag interleave parity)") {
    import spark.implicits._
    val a = Pipeline.from(Seq(1, 2).toDF("v"))
    val b = Pipeline.from(Seq(3).toDF("v"))
    assert(a.merge(b).toDF.as[Int].collect().sorted === Array(1, 2, 3))
  }

  test("StageGraph: cycle, duplicate edge, and orphan stage fail at build time with names") {
    val g = StageGraph.empty
      .addSource("src")
      .addStage(Stage("a", identity))
      .addStage(Stage("b", identity))
      .addEdge("src", "a").addEdge("a", "b")
    assert(!g.hasCycle)
    g.validate()

    val cyclic = g.addEdge("b", "a")
    assert(cyclic.hasCycle)
    val cycleErr = intercept[IllegalArgumentException](cyclic.validate())
    assert(cycleErr.getMessage.contains("cycle") && cycleErr.getMessage.contains("a"))

    val duped = g.addEdge("a", "b")
    assert(duped.hasDuplicatedEdge)
    assert(intercept[IllegalArgumentException](duped.validate())
      .getMessage.contains("a->b"))

    val orphan = StageGraph.empty.addSource("src").addStage(Stage("lost", identity))
    assert(intercept[IllegalArgumentException](orphan.validate())
      .getMessage.contains("lost"))

    // typo'd edge endpoints fail at wiring time, not at build
    assert(intercept[IllegalArgumentException](g.addEdge("a", "nope"))
      .getMessage.contains("nope"))
  }

  test("StageGraph: topological order is stable; subGraph/replaceVertex mirror the reference") {
    val g = StageGraph.empty
      .addSource("s1").addSource("s2")
      .addStage(Stage("mid", identity)).addStage(Stage("out", identity))
      .addEdge("s1", "mid").addEdge("s2", "mid").addEdge("mid", "out")
    assert(g.topologicalSort === Right(Vector("s1", "s2", "mid", "out")))
    assert(g.sinks === Vector("out"))

    // subGraph("mid") = mid + direct neighbours + touching edges only
    val sub = g.subGraph("mid")
    assert(sub.vertices.sorted === Vector("mid", "out", "s1", "s2"))
    assert(sub.edges.size === 3)

    // replaceVertex rewires both edge directions to the new stage
    val swapped = g.replaceVertex("mid", Stage("mid2", _.limit(1)))
    assert(swapped.vertices.contains("mid2") && !swapped.vertices.contains("mid"))
    assert(swapped.edges.count(e => e._1 == "mid2" || e._3 == "mid2") === 3)
    swapped.validate()
  }

  test("StageGraph build materializes a fan-out/fan-in DAG identically to direct DataFrame code") {
    import spark.implicits._
    val nums = (1 to 20).toDF("v")
    val g = StageGraph.empty
      .addSource("nums")
      .addStage(Stage("evens", _.filter(col("v") % 2 === 0)))
      .addStage(Stage("big", _.filter(col("v") > 15)))
      .addStage(Stage("sum", _.agg(sum("v").as("total"))))
      .addEdge("nums", "evens")
      .addEdge("nums", "big", HashEdge(4, Seq("v")))
      .addEdge("evens", "sum").addEdge("big", "sum")
    val out = g.build(Map("nums" -> nums))("sum").as[Long].head()
    // union keeps duplicates (complexdag interleave parity): evens + >15
    val expect = (1 to 20).filter(_ % 2 == 0).sum + (1 to 20).filter(_ > 15).sum
    assert(out === expect.toLong)
    // missing source input is a named build-time error
    assert(intercept[IllegalArgumentException](g.build(Map.empty))
      .getMessage.contains("nums"))
  }

  test("complexdag: fan-out + per-branch path recording + fan-in") {
    // reference complexdag: each Node appends its name to a Vector[String]
    // payload; Sink receives the interleaved union of all paths
    // (examples/streaming/complexdag/.../Dag.scala:77-93, Node.scala)
    import spark.implicits._
    def node(name: String) = Stage(name, _.withColumn("path",
      concat(col("path"), lit(s" -> $name"))))
    val source = Pipeline.from(
      Seq(1, 2, 3, 4).toDF("v").withColumn("path", lit("source")))
    val branchEven = source ~> Stage("evens", _.filter(col("v") % 2 === 0)) ~> node("node_1") ~> node("node_2")
    val branchOdd = source ~> Stage("odds", _.filter(col("v") % 2 === 1)) ~> node("node_3")
    val got = branchEven.merge(branchOdd).toDF
      .as[(Int, String)].collect().toMap
    assert(got === Map(
      2 -> "source -> node_1 -> node_2", 4 -> "source -> node_1 -> node_2",
      1 -> "source -> node_3", 3 -> "source -> node_3"))
  }
}
