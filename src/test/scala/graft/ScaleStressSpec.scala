package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

/** Measured evidence for the 100x scale posture (README "Scale design"):
  * explode the bench corpus (sf0.1) 10x into a temp dir — fact tables
  * replicated with disjoint key ranges, dimensions untouched, exactly how a
  * corpus grows against a stable entity universe — and run the heaviest
  * registry queries once each, asserting they (a) complete, (b) keep the
  * plan shape they had at bench scale (no CartesianProduct anywhere, no NEW
  * broadcast exchanges appearing, the fact table never on a broadcast build
  * side), and (c) leave the driver heap bounded (results are never
  * collect()ed; only counts cross to the driver).
  *
  * Env-gated (`GRAFT_SCALE_STRESS=1`) because the explode step writes ~1 GB
  * of parquet and the run takes minutes — it is scale evidence, not a unit
  * test. Numbers from the last run are recorded in README "Scale stress". */
class ScaleStressSpec extends SparkTestBase {

  private val enabled = sys.env.get("GRAFT_SCALE_STRESS").contains("1")
  private val baseSf = "/root/testdata/sf0.1"
  private val Copies = 10
  private val KeyOff = 10000000L // > any sf0.1 key; keeps replicas disjoint

  private val Heavy = Seq("dedup_minhash", "dedup_rewrite", "q43_join_six",
    "ann_ivfpq_topk", "pipeline_tokenize_pack")

  /** Fact replicas get shifted surrogate keys; joins fan the extra volume
    * onto the SAME dimension rows — the realistic 10x growth shape (more
    * orders per customer, more docs per source), and the adversarial one
    * for dedup (every chunk now exists >= Copies times). */
  private def explodeFact(dir: Path, name: String, keys: Seq[String]): Unit = {
    val base = Tables.t(spark, baseSf, name)
    val copies = base.withColumn("copy",
      explode(expr(s"sequence(0L, ${Copies - 1}L)")))
    keys.foldLeft(copies) { (d, k) =>
      d.withColumn(k, col(k) + col("copy") * KeyOff)
    }.drop("copy").write.mode("overwrite").parquet(s"$dir/$name.parquet")
  }

  private def copyDim(dir: Path, name: String): Unit =
    Tables.t(spark, baseSf, name).write.mode("overwrite")
      .parquet(s"$dir/$name.parquet")

  private def broadcastSubtrees(p: SparkPlan): Seq[SparkPlan] = {
    val out = collection.mutable.Buffer[SparkPlan]()
    def walk(n: SparkPlan): Unit = {
      n match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case b: BroadcastExchangeExec => out += b
        case _ =>
      }
      n.children.foreach(walk)
      n.subqueries.foreach(walk)
    }
    walk(p)
    out.toSeq
  }

  private def usedHeapGiB(): Double = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024 * 1024)
  }

  /** count() alone is NOT a fair completion probe: Catalyst prunes unread
    * columns and eliminates cardinality-preserving joins under it (seen
    * live: dedup_rewrite's whole reconstruction pipeline optimized away,
    * 0.1 s "completion"). Hash every output column into the aggregate so
    * the full plan actually executes. */
  private def run(name: String, dir: String): (Long, Double, DataFrame) = {
    val df = SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    val n = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)"))
      .head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, df)
  }

  test("sf0.1 exploded 10x: heavy queries complete, plans stay stable, driver heap bounded") {
    assume(enabled, "scale-stress evidence run; set GRAFT_SCALE_STRESS=1")
    val dir = Files.createTempDirectory("graft-scale")
    try {
      explodeFact(dir, "lineitem", Seq("l_orderkey"))
      explodeFact(dir, "orders", Seq("o_orderkey"))
      explodeFact(dir, "documents", Seq("doc_id"))
      explodeFact(dir, "embeddings", Seq("vec_id"))
      Seq("customer", "supplier", "part", "nation", "region").foreach(copyDim(dir, _))

      // baseline plan shapes at bench scale, executed so AQE has finalized
      val baseBroadcasts = Heavy.map { q =>
        val (_, _, df) = run(q, baseSf)
        q -> broadcastSubtrees(df.queryExecution.executedPlan).size
      }.toMap
      spark.sharedState.cacheManager.clearCache() // minhash sig caches etc.

      val report = Heavy.map { q =>
        val (n, secs, df) = run(q, dir.toString)
        assert(n > 0, s"$q returned no rows on the exploded corpus")
        val plan = df.queryExecution.executedPlan
        val planStr = plan.toString
        assert(!planStr.contains("CartesianProduct"),
          s"$q plans a CartesianProduct at 10x scale:\n$planStr")
        val bs = broadcastSubtrees(plan)
        assert(bs.size <= baseBroadcasts(q),
          s"$q grew NEW broadcast exchanges at 10x (${bs.size} vs " +
            s"${baseBroadcasts(q)}) — a fact side crossed the threshold?")
        if (q == "q43_join_six")
          assert(bs.forall(b => !b.toString.contains("lineitem.parquet")),
            s"$q broadcasts the exploded fact table:\n${bs.mkString("\n")}")
        val heap = usedHeapGiB()
        assert(heap < 8.0,
          f"driver heap $heap%.1f GiB after $q — results must not accumulate driver-side")
        spark.sharedState.cacheManager.clearCache()
        f"$q%-16s rows=$n%-8d ${secs}%6.1f s  heap=$heap%.1f GiB  broadcasts=${bs.size}/${baseBroadcasts(q)}"
      }
      info("scale-stress (10x sf0.1, local[4]):")
      report.foreach(info(_))
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }
}
