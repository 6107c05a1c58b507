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
