package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

import scala.util.Random

/** Sampling.prefixSum is the engine's shared scalable global-ordering
  * primitive — pipeline_pack_sequences, mm_shard_manifest,
  * pipeline_tokenize_pack, and pipeline_curriculum all derive their
  * placement from it. Pin its contract directly: the two-phase
  * (range-bucket + broadcast bases + partition-local window) sum must
  * equal the sequential exclusive prefix sum in key order, for adversarial
  * key layouts — negative keys, extreme clustering (all rows in one
  * bucket), extreme spread (empty buckets), and singletons. */
class PrefixSumPropertySpec extends SparkTestBase {

  private def sequential(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (k, v) =>
      val r = k -> acc; acc += v; r
    }.toMap
  }

  private def viaSpark(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = rows.toDF("k", "v")
    Sampling.prefixSum(spark, df, "k", "v", "out")
      .select(col("k"), col("out")).as[(Long, Long)].collect().toMap
  }

  test("two-phase prefix sum == sequential exclusive prefix sum under random key layouts") {
    val rng = new Random(42)
    for (trial <- 1 to 5) {
      val n = 200 + rng.nextInt(800)
      // keys: mixed-sign, sparse with occasional tight clusters so several
      // range buckets are empty and others dense
      val keys = rng.shuffle(
        (0 until n).map(_ => rng.nextLong() % (1L << 40))
          ++ (0 until 50).map(i => 7000000L + i)).distinct
      val rows = keys.map(k => k -> (rng.nextInt(1000).toLong))
      assert(viaSpark(rows) == sequential(rows), s"trial $trial (n=${rows.size})")
    }
  }

  test("degenerate layouts: single row, two rows, all keys in one bucket") {
    assert(viaSpark(Seq(5L -> 9L)) == Map(5L -> 0L))
    assert(viaSpark(Seq(10L -> 3L, -10L -> 4L)) == Map(-10L -> 0L, 10L -> 4L))
    // 100 consecutive keys: the bucket-range width rounds to >= the span,
    // so every row lands in one bucket and the window does all the work
    val tight = (0L until 100L).map(i => i -> 2L)
    assert(viaSpark(tight) == sequential(tight))
  }

  test("zero values contribute nothing but still receive their offset") {
    val rows = Seq(1L -> 0L, 2L -> 5L, 3L -> 0L, 4L -> 7L)
    assert(viaSpark(rows) == Map(1L -> 0L, 2L -> 0L, 3L -> 5L, 4L -> 5L))
  }
}
