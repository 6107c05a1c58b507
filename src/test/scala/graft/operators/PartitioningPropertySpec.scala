package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based partitioner parity — the reference property-tests its
  * partitioners (reference: streaming/src/test/scala/io/gearpump/streaming/partitioner/GroupByPartitionerSpec.scala,
  * ShuffleGroupingPartitionerSpec); the Spark equivalents carry the same
  * contracts: hash partitioning co-locates equal keys, round-robin balances
  * counts, range partitioning yields non-overlapping ordered ranges. */
class PartitioningPropertySpec extends SparkTestBase {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val keyedGen =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 1000)))

  test("hash partitioning (GroupByPartitioner parity): one partition per key") {
    import spark.implicits._
    check(Prop.forAll(keyedGen) { rows =>
      val df = rows.toDF("k", "v").repartition(8, col("k"))
        .select(col("k"), spark_partition_id().as("p"))
      df.groupBy("k").agg(countDistinct(col("p")).as("n"))
        .agg(max(col("n"))).head().getLong(0) == 1L
    })
  }

  test("round-robin (ShufflePartitioner parity): partition sizes differ by <= 1") {
    import spark.implicits._
    // AQE's partition coalescing legitimately merges tiny post-shuffle
    // partitions, which would hide the round-robin contract under test
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try check(Prop.forAll(keyedGen) { rows =>
      // the round-robin contract is per-sender balance (reference
      // ShuffleGroupingPartitioner: random start, then load-equal);
      // localCheckpoint pins a literal single sender — a bare coalesce(1)
      // would be removed by CollapseRepartition
      val sizes = rows.toDF("k", "v").coalesce(1).localCheckpoint()
        .repartition(4)
        .select(spark_partition_id().as("p"))
        .groupBy("p").count().select("count").as[Long].collect()
      sizes.isEmpty || (sizes.max - sizes.min) <= 1
    })
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }

  test("range partitioning: partitions hold non-overlapping ordered ranges") {
    import spark.implicits._
    check(Prop.forAll(keyedGen) { rows =>
      val bounds = rows.toDF("k", "v").repartitionByRange(4, col("k"))
        .select(col("k"), spark_partition_id().as("p"))
        .groupBy("p").agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
        .orderBy(col("lo")).select("lo", "hi").as[(Int, Int)].collect()
      bounds.sliding(2).forall {
        case Array((_, hi1), (lo2, _)) => hi1 <= lo2
        case _ => true
      }
    })
  }
}
