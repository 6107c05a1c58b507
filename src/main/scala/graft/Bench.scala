package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs the headline queries against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are forced through
  * the noop sink so every query executes its full physical plan (a bare
  * count() would let Catalyst collapse scans to metadata). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val loadStart = osLoadAvg()
    val spark = Engine.session("graft-bench", s"local[$cpus]")
    val headline = SparkEntry.registry.filter(_.headline)
    // SOL streaming first, on a pristine JVM: the relational queries below
    // leave broadcast blocks and old-gen garbage that starve the 20M-row
    // stream batches (observed: 1.5 s/batch fresh vs >30 s/batch after the
    // batch suite — a single-JVM-bench artifact, not engine capacity; on a
    // cluster, streaming doesn't share executors with a finished batch job).
    val (streamRps, streamRpsSpread) =
      if (sys.env.get("SPARK_GRAFT_SOL").contains("off")) (0.0, 0.0)
      else solThroughput(spark)
    // Streaming latency leg of the baseline (the reference publishes 8 ms
    // avg task-to-task latency): per-micro-batch triggerExecution
    // percentiles at a small, unsaturated trigger — measured AFTER the
    // throughput probe's heap churn is collected, BEFORE the batch suite.
    // Repeated LatencyReps times with a per-probe spread, the same noise
    // discipline the headline queries carry: r15's single-shot p50 read
    // 333 ms vs r14's 120 ms on unchanged streaming code, and nothing in
    // the JSON could say whether that was regression or scheduling
    // lottery. The reported histogram is the min-p50 rep (the quietest
    // window); the spread column is (max p50 − min p50) / min p50.
    System.gc()
    val (latencyReading, latencySpread) =
      if (sys.env.get("SPARK_GRAFT_SOL").contains("off"))
        (Option.empty[LatencyReading], 0.0)
      else repeatedReading(LatencyReps)(latencyProbe(spark))
    val latency = latencyReading.map(_.hist)
    // Async-progress-tracking reading beside the synchronous one: the
    // walCommit/commitOffsets fsyncs leave the critical path (the
    // at-least-once tradeoff; see latencyAsyncProbe).
    val (latencyAsync, latencyAsyncSpread) =
      if (sys.env.get("SPARK_GRAFT_SOL").contains("off"))
        (Option.empty[LatencyReading], 0.0)
      else repeatedReading(LatencyReps)(latencyAsyncProbe(spark))
    // Continuous-trigger record-transit latency: the mode built for the
    // map-only shape the reference's 8 ms task-to-task figure measures
    // (micro-batch p50 above is the per-batch floor, ~19x that baseline).
    val (latencyCont, latencyContSpread) =
      if (sys.env.get("SPARK_GRAFT_SOL").contains("off")) (None, 0.0)
      else repeatedProbe(LatencyReps)(
        graft.streaming.ContinuousLatency.measure(spark))
    latencyCont.foreach(h => System.err.println(s"[bench] continuous latency probe: $h"))
    // drop the probe's garbage before timing the relational suite, then
    // warm the JVM/codegen once on the smallest SF so per-query times
    // measure the engine, not first-call classloading.
    System.gc()
    headline.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Load gate (r16 judging: bench totals r13-r16 ran at load averages
    // 1.6/3.9/6.6/3.3 and became uncomparable — every r16 headline query
    // read +5%..+64% vs r15 on a binary whose only hot-path changes were
    // work-removing, the signature of box contention the JSON could note
    // but not remove). Before the timed query loop, spin-wait up to
    // LoadGateMaxWaitSec for the 1-min load average to drop below
    // LoadGateThreshold, so the suite gets a quiet anchor when the box
    // allows one; if the box never quiets, proceed and let the per-query
    // load stamps below say so. Disable with SPARK_GRAFT_LOAD_GATE=off
    // (e.g. for quick local iteration).
    // Known cost: the gate runs AFTER the SOL/latency probes and warm-up,
    // so on an otherwise-idle box the 1-min average it polls is dominated
    // by the bench's OWN just-finished work and takes ~1-2 min to decay —
    // that wait is self-load draining, not tenant detection. Acceptable
    // price: the suite still starts quiet, which is the point; read
    // gateWaited as "time spent getting quiet", not "time blocked by
    // others".
    val gateWaited =
      if (sys.env.get("SPARK_GRAFT_LOAD_GATE").contains("off")) 0L
      else {
        val t0 = System.currentTimeMillis()
        var now = osLoadAvg()
        while (now >= LoadGateThreshold &&
               System.currentTimeMillis() - t0 < LoadGateMaxWaitSec * 1000L) {
          System.err.println(f"[bench] load gate: load_avg $now%.1f >= $LoadGateThreshold%.1f, waiting...")
          Thread.sleep(15000)
          now = osLoadAvg()
        }
        (System.currentTimeMillis() - t0) / 1000
      }
    val loadAtSuite = osLoadAvg()
    System.err.println(f"[bench] load gate: waited ${gateWaited}s, suite starts at load_avg $loadAtSuite%.1f")
    // Nine timed reps, report min AND median: a single sample folds GC
    // pauses and compilation stalls of THIS box into the graded number;
    // the min is the quietest-window estimator, the median the typical-rep
    // estimator — when they diverge (r16: q44 spread 4.85 meant even the
    // min-of-9 was likely inflated) the divergence itself flags load
    // inflation inline, per query, without a rerun.
    // The rep count is PINNED at 9 regardless of load (r15 judging: r13
    // min-of-3 / r14 min-of-5 / r15 min-of-9 made the round-over-round
    // TOTAL incomparable on top of the load differences — a constant rep
    // count removes the one confound the bench controls; 9 reps cost
    // ~25 s and give the min many chances to land in a quiet scheduling
    // window on a loaded box). The JSON carries a per-query spread column
    // ((max-min)/min over the reps) plus the load average sampled at each
    // query's start, so the round-over-round reader can see which numbers
    // are sample-stable and which are scheduling lottery, per query.
    val loaded = loadAtSuite > 2.0
    val nReps = 9
    // Mid-suite re-gate (r18 judging: the graded window ran at load
    // 1.7-1.9 and the verdict hinged on un-reproducible contention; the
    // one gate at suite start could not help a tenant that arrives
    // mid-suite). Between queries — NEVER inside a query's timed reps —
    // estimate the EXTERNAL load as (1-min load average − this JVM's own
    // CPU utilization over the same trailing window) and, when it exceeds
    // the quiet-box bar, wait for it to decay before starting the next
    // query. Subtracting self-utilization matters: the bench's own
    // 32-core bursts push the load average past any reasonable bar, and
    // a gate on raw load would stall the suite on its own work. Waits are
    // budgeted (per-query and per-suite caps) so a permanently-loaded box
    // still finishes; the JSON carries per-query external-load stamps +
    // total re-gate seconds either way.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def processCpuSec(): Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => -1.0
    }
    var lastCpuSec = processCpuSec()
    var lastWallNs = System.nanoTime()
    var regateWaited = 0L
    val regateSuiteBudget = 360L
    def externalLoad(): Double = {
      val cpu = processCpuSec()
      val wall = System.nanoTime()
      val dWall = math.max(1e-3, (wall - lastWallNs) / 1e9)
      val self = if (cpu < 0 || lastCpuSec < 0) Double.MaxValue
                 else math.max(0.0, (cpu - lastCpuSec) / dWall)
      lastCpuSec = cpu; lastWallNs = wall
      math.max(0.0, osLoadAvg() - self)
    }
    val results = headline.map { q =>
      var extLoad = externalLoad()
      if (!sys.env.get("SPARK_GRAFT_LOAD_GATE").contains("off")) {
        val qDeadline = System.currentTimeMillis() + 120000L
        while (extLoad >= LoadGateThreshold && regateWaited < regateSuiteBudget &&
               System.currentTimeMillis() < qDeadline) {
          System.err.println(f"[bench] re-gate before ${q.name}: external load $extLoad%.1f >= $LoadGateThreshold%.1f, waiting...")
          Thread.sleep(15000)
          regateWaited += 15
          extLoad = externalLoad()
        }
      }
      val qLoad = osLoadAvg()
      val reps = (1 to nReps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e"); false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val times = reps.map(_._1).sorted
      val median = times(times.length / 2)
      (q.name, times.min, median, reps.forall(_._2),
        (times.max - times.min) / times.min, qLoad, extLoad)
    }
    // Scaling exponent (r17 judge task 6): time every headline query at
    // the two smaller SFs too (min-of-3 — these points are cheap) and
    // report, per query, the 3-point time curve plus the log-log slope
    // over the TWO LARGEST SFs (the smallest points are fixed-overhead
    // dominated — scheduling + codegen floor ~0.1 s — so a full-curve
    // regression would understate every exponent; the top decade is
    // where data cost dominates and a superlinear operator shows
    // slope > 1 while the biggest shipped SF is still 0.1).
    // Runs AFTER the timed loop so headline totals stay round-comparable.
    val scalingJson =
      if (sys.env.get("SPARK_GRAFT_SCALING").contains("off")) ""
      else {
        def sfOf(dir: String): Option[Double] =
          "sf([0-9.]+)/?$".r.findFirstMatchIn(dir)
            .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)
        val smallDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
          .filter(d => new java.io.File(d).isDirectory &&
            sfOf(d) != sfOf(sfDir))
        (sfOf(sfDir), smallDirs) match {
          case (Some(sfMain), ds) if ds.nonEmpty =>
            val smallPts = ds.map { d =>
              val times = headline.flatMap { qq =>
                val reps = (1 to 3).flatMap { _ =>
                  val t0 = System.nanoTime()
                  val ok =
                    try {
                      qq.run(spark, d).write.format("noop").mode("overwrite").save()
                      true
                    } catch { case _: Throwable => false }
                  if (ok) Some((System.nanoTime() - t0) / 1e9) else None
                }
                // a query that fails at this SF gets NO point — recording
                // the fast-fail elapsed time would fabricate the curve
                // and the slope (the JSON shows null instead)
                if (reps.isEmpty) None else Some(qq.name -> reps.min)
              }.toMap
              (sfOf(d).get, times)
            }
            // main-SF anchor: only queries whose timed loop succeeded
            val mainTimes = results.filter(_._4).map(r => r._1 -> r._2).toMap
            val pts = (smallPts :+ (sfMain, mainTimes)).sortBy(_._1)
            val sfsArr = pts.map(p => f"${p._1}%s").mkString("[", ",", "]")
            val names = headline.map(_.name)
            val timesJson = names.map { n =>
              "\"" + n + "\":" + pts.map(p =>
                p._2.get(n).map(v => f"$v%.3f").getOrElse("null"))
                .mkString("[", ",", "]")
            }.mkString("{", ",", "}")
            val (loSf, loT) = pts(pts.length - 2)
            val (hiSf, hiT) = pts.last
            val slopeJson = names.map { n =>
              (loT.get(n), hiT.get(n)) match {
                case (Some(a), Some(b)) if a > 0 && b > 0 =>
                  val sl = math.log(b / a) / math.log(hiSf / loSf)
                  "\"" + n + f"\":$sl%.2f"
                case _ => "\"" + n + "\":null"
              }
            }.mkString("{", ",", "}")
            s""","scaling":{"sfs":$sfsArr,"reps_small_sf":3,"times":$timesJson,"slope_top_decade":$slopeJson}"""
          case _ => ""
        }
      }
    val qs = results.map { case (k, v, _, ok, _, _, _) =>
      if (ok) "\"" + k + f"\":$v%.3f" else "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val medians = results.map { case (k, _, m, ok, _, _, _) =>
      if (ok) "\"" + k + f"\":$m%.3f" else "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val spreads = results.map { case (k, _, _, _, sp, _, _) =>
      "\"" + k + f"\":$sp%.2f"
    }.mkString("{", ",", "}")
    val qloads = results.map { case (k, _, _, _, _, ld, _) =>
      "\"" + k + f"\":$ld%.1f"
    }.mkString("{", ",", "}")
    val qExtLoads = results.map { case (k, _, _, _, _, _, el) =>
      "\"" + k + f"\":$el%.1f"
    }.mkString("{", ",", "}")
    val errors = results.filterNot(_._4).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._4).map(_._2).sum
    val totalMedian = results.filter(_._4).map(_._3).sum
    // Per-phase micro-batch latency attribution (r17 judge task 4: p50
    // went 118 -> 168 ms across two load-gated readings while continuous
    // stayed at 1 ms — the phase medians say WHERE the per-batch time
    // goes: queryPlanning = Catalyst work per trigger, addBatch =
    // execution, latestOffset/walCommit/commitOffsets = progress
    // bookkeeping, unattributed = trigger scheduling overhead the
    // durationMs map doesn't itemize). Medians come from the SAME rep the
    // reported histogram came from (the min-p50 window).
    def phaseJsonOf(key: String, r: Option[LatencyReading]): String =
      r.map(_.phases).filter(_.nonEmpty).fold("") { ph =>
        val fields = ph.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + s"\":$v" }.mkString("{", ",", "}")
        s""","$key":$fields"""
      }
    val asyncJson = latencyAsync.map(_.hist).fold("")(h =>
      f""","latency_async_ms_p50":${h.p50Ms},"latency_async_ms_p95":${h.p95Ms},"latency_async_ms_p99":${h.p99Ms},"latency_async_ms_mean":${h.meanMs}%.1f,"latency_async_ms_p50_spread":$latencyAsyncSpread%.2f""") +
      phaseJsonOf("latency_async_phase_ms", latencyAsync)
    val lat = latency.fold("")(h =>
      f""","latency_ms_p50":${h.p50Ms},"latency_ms_p95":${h.p95Ms},"latency_ms_p99":${h.p99Ms},"latency_ms_mean":${h.meanMs}%.1f,"latency_ms_p50_spread":$latencySpread%.2f""") +
      phaseJsonOf("latency_phase_ms", latencyReading) + asyncJson +
      latencyCont.fold("")(h =>
        f""","latency_continuous_ms_p50":${h.p50Ms},"latency_continuous_ms_p95":${h.p95Ms},"latency_continuous_ms_p99":${h.p99Ms},"latency_continuous_ms_mean":${h.meanMs}%.1f,"latency_continuous_ms_p50_spread":$latencyContSpread%.2f""")
    // Self-reported contention telemetry: round 8's driver-captured bench
    // regressed ~2x purely from concurrent load on the box (a clean rerun
    // of identical code was the best round on record), and the artifact
    // had no way to show it. Report the 1-min load average at start/end
    // (from the JVM's own OS bean) so a contaminated sample is detectable
    // from the JSON itself: on a quiet 32-thread box load_avg should be
    // ~the bench's own parallelism; >>cpus means a shared box.
    val loadEnd = osLoadAvg()
    // cpus as a JSON number: the env value may be "*" (local[*]) — resolve
    // that to the actual core count rather than emitting invalid JSON
    val cpusNum = scala.util.Try(cpus.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val load =
      f""","load_avg_start":$loadStart%.1f,"load_avg_end":$loadEnd%.1f,"cpus":$cpusNum"""
    val noise =
      if (loaded)
        f""","noise_note":"load_avg $loadAtSuite%.1f at suite start (after the gate): shared-box contention; per-query times are min-of-$nReps but may still be inflated — compare totals across rounds with the per-query load column, not at face value""""
      else ""
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","total_median":$totalMedian%.3f,"queries":$qs,"queries_median":$medians,"spread":$spreads,"query_load":$qloads,"query_ext_load":$qExtLoads,"load_gate_waited_sec":$gateWaited,"regate_waited_sec":$regateWaited,"load_at_suite_start":$loadAtSuite%.1f,"reps":$nReps,"errors":$errors,"stream_rows_per_sec":$streamRps%.0f,"stream_rows_per_sec_spread":$streamRpsSpread%.2f$lat$load$noise$scalingJson,"sf":"$sfDir"}"""
    // Evidence must be unlosable (round-2 lesson: the TaskKilled WARN flood
    // after solThroughput's q.stop() pushed the metric line out of the
    // harness's captured log tail). So: persist to a file FIRST, then stop
    // Spark (quiescing all executor log output), then print the line last.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
    if (results.exists(!_._4)) sys.exit(1)
  }

  /** Load-gate knobs: the suite waits (up to the cap) for the 1-min load
    * average to drop below the threshold before the timed query loop.
    * 1.5 is the judge-suggested "quiet box" bar (the bench's own JVM is
    * idle while waiting, so the load it sees is other tenants); the 10-min
    * cap bounds the bench's wall time on a box that never quiets — in
    * that case the per-query load stamps carry the evidence instead. */
  private val LoadGateThreshold = 1.5
  private val LoadGateMaxWaitSec = 600L

  /** 1-minute system load average (-1.0 if the platform can't report it). */
  private def osLoadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  /** Reps for the two latency probes — pinned like the query rep count so
    * rounds compare; each probe run costs ~15-25 s, so 3 reps keep the
    * whole latency leg under ~2.5 min while giving the min a quiet window
    * and the spread a denominator. */
  private val LatencyReps = 3

  /** Run a latency probe `reps` times; return the min-p50 reading (the
    * quietest scheduling window — the same estimator as the per-query
    * min) plus the p50 spread ((max − min) / max(min, 1)) across reps.
    * Probes that fail (None) are dropped; all-failed returns (None, 0).
    * ONE estimator for both probe shapes (bare histogram + phase-carrying
    * reading) so the selection/spread policy cannot silently diverge. */
  private def repeatedBy[T](reps: Int)(probe: => Option[T])(
      p50Of: T => Long): (Option[T], Double) = {
    val hs = (1 to reps).flatMap(_ => probe)
    if (hs.isEmpty) (None, 0.0)
    else {
      val p50s = hs.map(p50Of)
      (Some(hs.minBy(p50Of)),
        (p50s.max - p50s.min).toDouble / math.max(p50s.min, 1L))
    }
  }

  private def repeatedProbe(reps: Int)(
      probe: => Option[graft.ops.AppRegistry.LatencyHistogram])
      : (Option[graft.ops.AppRegistry.LatencyHistogram], Double) =
    repeatedBy(reps)(probe)(_.p50Ms)

  /** One micro-batch latency rep: the percentile histogram plus the
    * per-phase medians (ms) of the SAME probe window, so the reported
    * p50 and its attribution come from one scheduling context. */
  private final case class LatencyReading(
      hist: graft.ops.AppRegistry.LatencyHistogram,
      phases: Map[String, Long])

  /** [[repeatedBy]] for phase-carrying readings: min-p50 rep wins,
    * spread over the reps' p50s. */
  private def repeatedReading(reps: Int)(probe: => Option[LatencyReading])
      : (Option[LatencyReading], Double) =
    repeatedBy(reps)(probe)(_.hist.p50Ms)

  /** Batch-latency percentiles at a small trigger: a 10k rows/s stream is
    * far below saturation, so each micro-batch's triggerExecution time IS
    * the engine's per-batch latency floor (planning + execution + commit),
    * the micro-batch analog of the reference's task-to-task latency
    * figure. Uses the same AppRegistry histogram the ops surface serves. */
  private def latencyProbe(spark: SparkSession): Option[LatencyReading] =
    measureLatency(spark, "latency probe") {
      graft.streaming.GraftSource
        .rate(spark, rowsPerSecond = 10000, payloadBytes = 100, numPartitions = 4)
        .writeStream.format("noop").start()
    }

  /** The same probe with ASYNC PROGRESS TRACKING (SPARK-39591): offset-log
    * and commit-log writes leave the trigger's critical path — exactly the
    * walCommit + commitOffsets ~2/3 of the synchronous floor the phase
    * decomposition attributes (the r16->r17 p50 drift's home). The
    * tradeoff is the reference's own at-least-once mode: on failure the
    * query replays from the last ASYNC-persisted offset (at-least-once)
    * instead of the last batch (exactly-once) — so this reading is
    * reported beside the synchronous one, not in place of it. Spark
    * allowlists the Kafka and memory sinks for async tracking; the probe
    * uses the memory sink (bounded here: ~250k tiny rows over the window)
    * since noop is not on the list. */
  private def latencyAsyncProbe(spark: SparkSession): Option[LatencyReading] = {
    val r = measureLatency(spark, "latency async probe") {
      graft.streaming.GraftSource
        .rate(spark, rowsPerSecond = 10000, payloadBytes = 100, numPartitions = 4)
        .writeStream.format("memory").queryName("graft_async_probe")
        .option("asyncProgressTrackingEnabled", "true")
        .start()
    }
    spark.catalog.dropTempView("graft_async_probe")
    r
  }

  private def measureLatency(spark: SparkSession, tag: String)(
      start: => org.apache.spark.sql.streaming.StreamingQuery)
      : Option[LatencyReading] = {
    try {
      val q = start
      // try/finally from the instant the stream exists: an exception between
      // start() and stop() would otherwise leave the probe stream running
      // under the batch suite, polluting its timings.
      try {
        // let codegen/classloading ramp pass BEFORE attaching the histogram,
        // so the percentiles measure steady state, not JVM warmup
        Thread.sleep(4000)
        val reg = new graft.ops.AppRegistry(spark)
        try {
          val deadline = System.currentTimeMillis() + 20000
          while (System.currentTimeMillis() < deadline &&
                 reg.latency(q.id).forall(_.count < 60)) Thread.sleep(250)
          val h = reg.latency(q.id)
          // per-phase medians over the same window's progress snapshots:
          // each batch reports Spark's durationMs breakdown
          // (triggerExecution spans the batch; the others are its
          // sub-spans), plus an "unattributed" row = median of per-batch
          // (triggerExecution − itemized sub-spans) — the trigger
          // scheduling overhead no durationMs key names.
          val batches = reg.metricsHistory(q.id).map(_._2.phases)
            .filter(_.nonEmpty)
          def medianOf(xs: Seq[Long]): Long =
            if (xs.isEmpty) 0L else xs.sorted.apply(xs.length / 2)
          val keys = batches.flatMap(_.keys).distinct
          val phaseMed = keys.map(k =>
            k -> medianOf(batches.flatMap(_.get(k)))).toMap
          val unattributed = medianOf(batches.map { p =>
            val trig = p.getOrElse("triggerExecution", 0L)
            math.max(0L, trig - (p - "triggerExecution").values.sum)
          })
          val phases =
            if (phaseMed.isEmpty) phaseMed
            else phaseMed + ("unattributed" -> unattributed)
          System.err.println(s"[bench] $tag: $h phases=$phases")
          h.map(LatencyReading(_, phases))
        } finally reg.close()
      } finally if (q.isActive) q.stop()
      // q.stop() may log "DAGScheduler: Failed to cancel job group <runId>.
      // Cannot find active jobs for it." — stop() cancels the query's job
      // group AFTER joining the query thread, so when the final micro-batch's
      // jobs already completed there is nothing left to cancel and Spark
      // warns. Benign by construction: the query is fully terminated before
      // the warning prints (reproduces after every streaming stop in the
      // test suites too), so no probe stream can leak into the batch suite.
    } catch { case e: Throwable => System.err.println(s"[bench] $tag: $e"); None }
  }

  /** @return (max steady-state batch rate, spread over the top-5 samples
    *         — (max − min(top5)) / min(top5)). The spread says whether
    *         the peak came from a stable plateau (≈0) or one lucky batch
    *         (large) — the max alone could not distinguish them. */
  private def solThroughput(spark: SparkSession): (Double, Double) = {
    try {
      // Fixed 20M-row micro-batches: every batch is a uniform saturation
      // sample. The plain `rate` source at an above-capacity ask grows its
      // backlog without bound, so a probe window saw only 1-2 giant,
      // memory-hungry batches — one bad sample decided the headline number.
      // 20M balances amortizing per-batch planning/commit overhead against
      // heap churn (40M-row ~5 GB batches degrade later samples AND the
      // relational suite afterwards).
      val q = graft.streaming.GraftSource
        .rateFixedBatch(spark, rowsPerBatch = 20000000, payloadBytes = 100)
        .writeStream.format("noop").start()
      val deadline = System.currentTimeMillis() + 45000
      // skip the first batch (codegen/classloading); JIT keeps ramping the
      // per-batch rate until ~batch 12-15, so collect enough samples that
      // the max reflects steady state
      def rates() = q.recentProgress.drop(1)
        .map(_.processedRowsPerSecond).filterNot(_.isNaN).filter(_ > 0)
      while (rates().length < 20 && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
      val obs = rates()
      q.stop()
      System.err.println(s"[bench] SOL batches: ${obs.map(_.toLong).mkString(",")}")
      if (obs.isEmpty) (0.0, 0.0)
      else {
        val top = obs.sorted.reverse.take(5)
        (top.head, if (top.size < 2) 0.0 else (top.head - top.min) / top.min)
      }
    } catch { case e: Throwable => System.err.println(s"[bench] SOL probe: $e"); (0.0, 0.0) }
  }
}
