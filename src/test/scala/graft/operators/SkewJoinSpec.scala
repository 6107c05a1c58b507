package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE skew-join splitting — the automatic half of the skew story
  * (q28_salted_join is the manual rewrite): a hot key whose partition dwarfs
  * the median gets split into multiple reducer tasks at runtime, no salting
  * code required. Engine turns skewJoin on by default; this spec proves it
  * actually engages and preserves results. */
class SkewJoinSpec extends SparkTestBase {

  private def findSmj(p: SparkPlan): Seq[SortMergeJoinExec] = {
    val out = collection.mutable.Buffer[SortMergeJoinExec]()
    def walk(n: SparkPlan): Unit = {
      n match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: SortMergeJoinExec => out += s
        case _ =>
      }
      n.children.foreach(walk)
    }
    walk(p)
    out.toSeq
  }

  test("a hot key is split by AQE instead of overwhelming one reducer") {
    import spark.implicits._
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.shuffle.partitions" -> "8")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carries 50k wide rows; 50 cold keys carry 10 each
      val left = spark.range(50000).select(lit("hot").as("k"),
          concat(lit("x" * 64), col("id").cast("string")).as("payload"))
        .unionByName(spark.range(500).select(
          concat(lit("cold"), (col("id") % 50).cast("string")).as("k"),
          col("id").cast("string").as("payload")))
      // a plain relation: an aggregate between the shuffle and the join
      // would block OptimizeSkewedJoin (its partitioning can't be replayed)
      val right = (Seq("hot") ++ (0 until 50).map("cold" + _))
        .toDF("k").withColumn("tag", lit(1))
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS queryExecution reaches its AQE final plan
      val n = joined.collect().length
      assert(n === 50500, s"join must be lossless, got $n")
      val smjs = findSmj(joined.queryExecution.executedPlan)
      assert(smjs.nonEmpty, "expected a sort-merge join under AQE")
      assert(smjs.exists(_.isSkewJoin),
        s"expected AQE to mark the join skew-handled:\n${joined.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("probedSalt sizes the salt to the observed key histogram") {
    // uniform keys: no key's estimated volume crosses the slot target,
    // so the salted join must degenerate to salt=1 (no build-side tax)
    val uniform = spark.range(20000)
      .select((col("id") % 1000).as("l_orderkey"), col("id").as("l_linenumber"))
    assert(Skew.probedSalt(uniform, "l_orderkey", targetRowsPerSlot = 1000L) === 1)
    // a planted hub far past the target (100k rows, ~100k estimated after
    // the 5% sample-up, vs a 1k-row slot) must clamp to MaxSalt
    val hub = spark.range(100000).select(lit(7L).as("l_orderkey"))
    assert(Skew.probedSalt(hub, "l_orderkey", targetRowsPerSlot = 1000L)
      === Skew.MaxSalt)
    // a mid-size hub lands between the clamps: ~5k estimated rows on one
    // key over a 1k slot -> salt ~5
    val mid = spark.range(5000).select(lit(7L).as("l_orderkey"))
      .unionByName(uniform.select(col("l_orderkey")))
    val s = Skew.probedSalt(mid, "l_orderkey", targetRowsPerSlot = 1000L)
    assert(s > 1 && s < Skew.MaxSalt, s"expected an intermediate salt, got $s")
  }

  test("the probe-derived salted join is semantics-preserving end to end") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.t(spark, dir, "lineitem")
    val o = graft.Tables.t(spark, dir, "orders")
    val salted = Skew.saltedRevenue(li, o).collect().toSeq
    val plain = Skew.plainRevenue(li, o).collect().toSeq
    assert(salted === plain)
  }

  test("probedSalt's memo invalidates when the files under the same path change") {
    // r16 review finding 3: a cache keyed by plan semantic hash alone
    // would keep serving a uniform corpus's salt=1 after the same parquet
    // dir is overwritten with a hub corpus — the exact single-reducer
    // fate the probe exists to avoid. The key folds in the scan's
    // resolved input files, so the overwrite (new part-file names) must
    // re-probe.
    val dir = java.nio.file.Files.createTempDirectory("salt-memo").toString
    try {
      spark.range(1000).select(col("id").as("k"))
        .write.mode("overwrite").parquet(dir)
      assert(Skew.probedSalt(spark.read.parquet(dir), "k",
        targetRowsPerSlot = 100L) === 1, "uniform corpus probes to 1")
      spark.range(100000).select(lit(7L).as("k"))
        .write.mode("overwrite").parquet(dir)
      val s2 = Skew.probedSalt(spark.read.parquet(dir), "k",
        targetRowsPerSlot = 100L)
      assert(s2 > 1, s"overwritten hub corpus must re-probe, got stale $s2")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
