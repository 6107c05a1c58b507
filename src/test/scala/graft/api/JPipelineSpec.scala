package graft.api

import graft.SparkTestBase
import graft.javaapi.JPipeline
import org.apache.spark.sql.{Dataset, Row}

/** The Java API mirror drives the same edge semantics as the Scala
  * Pipeline (reference javaapi parity) — exercised from Scala through the
  * exact java.util.function surface a Java caller would use. */
class JPipelineSpec extends SparkTestBase {

  private def jf(f: Dataset[Row] => Dataset[Row]): java.util.function.Function[Dataset[Row], Dataset[Row]] =
    new java.util.function.Function[Dataset[Row], Dataset[Row]] {
      override def apply(d: Dataset[Row]): Dataset[Row] = f(d)
    }

  test("stages, hash edge and merge compose like the Scala pipeline") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 5, i)).toDF("k", "v")
    val other = Seq((7, 1000)).toDF("k", "v")

    val out = JPipeline.from(df)
      .hash(8, "k")
      .stage(jf(_.groupBy("k").sum("v").toDF("k", "total")))
      .merge(JPipeline.from(other.withColumnRenamed("v", "total")))
      .toDF()

    val rows = out.as[(Int, Long)].collect().toMap
    assert(rows.size === 6)
    assert(rows(7) === 1000L)
    assert(rows.filterNot(_._1 == 7).values.sum === (1 to 100).sum.toLong)
    // the hash edge actually repartitioned on k
    val shuffled = JPipeline.from(df).hash(8, "k").stage(jf(identity)).toDF()
    assert(shuffled.rdd.getNumPartitions === 8)
  }

  test("broadcast edge marks the build side for the next join") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (i % 10, i)).toDF("k", "v")
    val dim = (0 until 10).map(i => (i, s"d$i")).toDF("k", "name")
    val joined = JPipeline.from(fact)
      .stage(jf(_.join(JPipeline.from(dim).broadcastEdge().stage(jf(identity)).toDF(), "k")))
      .toDF()
    assert(joined.count() === 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
