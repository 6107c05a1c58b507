package graft.tools

import graft.{Engine, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Throwaway r19 instrumentation: job/stage/task counts and wall time for
  * one registry query rep (after a warm rep that builds memoized state).
  * Not committed — deleted when the round's measurements conclude. */
object R19Probe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("minhashEq")) { minhashEq(); return }
    if (args.headOption.contains("minhashAB")) { minhashAB(args.lift(1).getOrElse("/root/testdata/sf0.1")); return }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "ann_graph_topk"
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = Engine.session("graft-r19probe")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    }
    // warm rep (builds + memoizes the index; codegen)
    val q = SparkEntry.queries(name)
    q(spark, sfDir).write.format("noop").mode("overwrite").save()
    Thread.sleep(1500)
    spark.sparkContext.addSparkListener(l)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Thread.sleep(2000)
    println(f"$name: reps=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f med=${times.sorted.apply(times.length / 2)}%.3f")
    println(s"$name: per-rep jobs=${jobs.get / reps} stages=${stages.get / reps} tasks=${tasks.get / reps} (totals ${jobs.get}/${stages.get}/${tasks.get} over $reps reps)")
    spark.stop()
  }

  /** A/B: old pairs-only dedup_minhash_fast surface vs the new
    * exact-verified surface, interleaved in one session. */
  private def minhashAB(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = Engine.session("graft-r19probe")
    def old() = graft.operators.Dedup.verifiedPairs(
      graft.operators.Dedup.bandedSig(
        graft.operators.Dedup.perRowSigFast(
          graft.Tables.t(spark, sfDir, "documents")).cache(),
        graft.operators.Dedup.xxBand))
      .orderBy(col("doc_a"), col("doc_b"))
    def neu() = SparkEntry.queries("dedup_minhash_fast")(spark, sfDir)
    def time(tag: String, mk: () => org.apache.spark.sql.DataFrame, reps: Int): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag ${ts.map(t => f"$t%.3f").mkString(" ")} min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }
    time("warm_old", old _, 6); time("warm_new", neu _, 6)
    time("old_1", old _, 7); time("new_1", neu _, 7)
    time("old_2", old _, 7); time("new_2", neu _, 7)
    spark.stop()
  }

  /** Does the xxhash64-banded MinHash pipeline emit the same PAIR SET as
    * the md5-banded (oracled) one at every shipped SF? */
  private def minhashEq(): Unit = {
    val spark = Engine.session("graft-r19probe")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val fast = SparkEntry.queries("dedup_minhash_fast")(spark, d)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val md5v = SparkEntry.queries("dedup_minhash")(spark, d)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"$d: fast=${fast.size} md5=${md5v.size} equal=${fast == md5v} " +
        s"onlyFast=${(fast -- md5v).take(5)} onlyMd5=${(md5v -- fast).take(5)}")
    }
    spark.stop()
  }
}
