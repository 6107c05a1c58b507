package graft.streaming

import graft.SparkTestBase
import org.scalacheck.{Prop, Test => SCTest}

/** Monoid laws (the property the reference's checkpointed state relies on,
  * state/api/MonoidState.scala:40-47) + Spark integration: the Aggregator
  * must equal a sequential fold regardless of partitioning — that equality
  * IS the correctness of distributed partial aggregation. */
class MonoidAggregatorSpec extends SparkTestBase {
  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p).passed)

  test("monoid laws: associativity and identity (longSum, mapSum)") {
    check(Prop.forAll { (a: Long, b: Long, c: Long) =>
      val m = GMonoid.longSum
      m.plus(m.plus(a, b), c) == m.plus(a, m.plus(b, c)) &&
        m.plus(a, m.zero) == a && m.plus(m.zero, a) == a
    })
    check(Prop.forAll { (a: Map[String, Long], b: Map[String, Long], c: Map[String, Long]) =>
      val m = GMonoid.mapSum[String]
      m.plus(m.plus(a, b), c) == m.plus(a, m.plus(b, c)) && m.plus(a, m.zero) == a
    })
  }

  test("aggregator equals sequential fold under any partitioning") {
    import spark.implicits._
    val agg = MonoidAggregator.longSumOf[Int](_.toLong)
    for (xs <- Seq(List(1), List(-5, 7, 1000000, 3), (1 to 997).toList)) {
      val distributed = spark.createDataset(xs).repartition(7)
        .select(agg.toColumn).head()
      assert(distributed === xs.map(_.toLong).sum)
    }
  }

  test("keyed typed aggregation (groupByKey + monoid) matches groupBy sum") {
    import spark.implicits._
    val data = Seq(("a", 1.5), ("b", 2.0), ("a", 3.25), ("c", -1.0), ("b", 0.5))
    val agg = MonoidAggregator.doubleSumOf[(String, Double)](_._2)
    val typed = spark.createDataset(data).groupByKey(_._1)
      .agg(agg.toColumn.name("s")).collect().toMap
    assert(typed === Map("a" -> 4.75, "b" -> 2.5, "c" -> -1.0))
  }
}
