package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation recipes (SURVEY §7.4-7). AQE's skew-join splitting is on
  * by default in Engine; this operator demonstrates the *manual* salting
  * rewrite for when a hot key would still overwhelm one reducer at 100 TB:
  * replicate the build side SALT times, scatter the probe side by a
  * deterministic per-row salt, join on (key, salt). The oracle is the PLAIN
  * join — proving the salted rewrite is semantics-preserving is exactly the
  * point of the query. ScaleStressSpec measures the payoff: on a corpus
  * with a planted hub order key, [[saltedRevenue]] vs [[plainRevenue]] with
  * AQE skew-splitting disabled (the single-reducer fate salting exists to
  * avoid), ratio logged in README "Scale stress".
  *
  * MEASURED ORDERING (r14 stress run, 13M-row lineitem with a 90%-volume
  * hub order key, sf0.1 orders build side): naive single-reducer (AQE
  * skew-split off) 7.6 s > hand-salted static Salt=8 4.0 s > naive with
  * AQE mapper-granular skew-split 3.2 s. **AQE's split dominates the
  * static salt on this shape** — it pays the replication tax only on the
  * hot partition (mapper-granular sub-splits of the one oversized
  * shuffle block) while static salting taxes the ENTIRE build side
  * Salt×. The production answer on an AQE engine is therefore: leave
  * skew-split on and do nothing. The salted form earns its keep on
  * pre-AQE engines, single-mapper shuffles, and skew below AQE's
  * byte-detection thresholds — and as the teaching comparison this
  * query exists to be. To stop the teaching constant from itself being
  * a liability (a static Salt=8 on an UNskewed corpus taxes the build
  * side 8× for nothing — measured 15.1 s on the r14 skew-leg corpus
  * whose per-key volume never justified 8), the salt count is now
  * probe-derived: [[probedSalt]] estimates the hottest key's row volume
  * from a deterministic sample and sizes the salt to it, collapsing to
  * salt=1 (a plain join) when no key exceeds one reducer's comfortable
  * share.
  */
object Skew {
  /** Upper bound on the probe-derived salt: beyond this the build-side
    * replication tax exceeds any residual single-key win. */
  private[graft] val MaxSalt = 32

  /** Rows of one key a single reducer should comfortably own before the
    * key is worth splitting (~a few seconds of per-task join work; far
    * below `maxPartitionBytes`-sized blocks). */
  private[graft] val TargetRowsPerSlot = 1000000L

  /** Deterministic sample fraction for the key-histogram probe. At 100 TB
    * this would come from table statistics or a sketch maintained at
    * ingest; a seeded 5% sample is the self-contained stand-in that keeps
    * the probe one cheap scan. */
  private[graft] val ProbeFraction = 0.05

  /** Memoized probe results per (session, probe-plan semantic hash, key):
    * constructing the q28 plan runs the probe's Spark jobs EAGERLY (the
    * salt count must exist before the join plan can be declared), so
    * without memoization every registry enumeration / plan lint / bench
    * rep would re-scan the fact sample. The cache makes construction lazy
    * in the amortized sense — one probe per distinct (frame, key) per
    * session. Stopped sessions are swept on every lookup (the beamCache
    * discipline: the cached ints are worthless once their context dies).
    * A plan semantic hash alone would serve a STALE salt after the
    * underlying data changes (overwrite the same parquet dir with a
    * skewed corpus → identical plan, new risk profile — r16 review
    * finding 3), so the key also folds in the scan's resolved input-file
    * list: an overwrite writes new part-file names, which misses the
    * cache and re-probes. inputFiles is a driver-side read of the file
    * index the relation already holds — no job. */
  private val saltCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, Int, Int, String, Long), Int]

  /** SALT COUNT FROM THE OBSERVED KEY HISTOGRAM: estimate the hottest
    * key's row count from a seeded sample (sampled max count ÷ fraction),
    * then size the salt so each (key, salt) slot holds at most
    * [[TargetRowsPerSlot]] rows — clamped to [1, [[MaxSalt]]]. A uniform
    * corpus (TPC-H lineitem: ≤7 rows per order key) probes to salt=1 and
    * [[saltedRevenue]] collapses to the PLAIN join (no salt columns, no
    * build-side explode — a plan invariant, PlanInvariantsSpec) — no 8×
    * build-side tax for skew that isn't there. The probe is a
    * driver-scalar read of one aggregated sample (the k-means centroid
    * discipline), not a collect of data rows. NOTE: the probe runs Spark
    * jobs at DataFrame-construction time (memoized per (session, frame,
    * key) — see [[saltCache]]). */
  private[graft] def probedSalt(probe: DataFrame, keyCol: String,
      targetRowsPerSlot: Long = TargetRowsPerSlot): Int = {
    saltCache.filterInPlace { case ((sess, _, _, _, _), _) =>
      !sess.sparkContext.isStopped }
    saltCache.getOrElseUpdate(
      (probe.sparkSession, probe.queryExecution.analyzed.semanticHash(),
        probe.inputFiles.sorted.mkString("\n").hashCode, // order-free
        keyCol, targetRowsPerSlot),
      probedSaltImpl(probe, keyCol, targetRowsPerSlot))
  }

  private def probedSaltImpl(probe: DataFrame, keyCol: String,
      targetRowsPerSlot: Long): Int = {
    // the max over ZERO sampled groups is one row holding NULL (an empty
    // or tiny frame whose 5% sample came back empty) — degrade to salt=1
    // rather than NPE inside query construction (r15 review)
    val row = probe.sample(withReplacement = false, ProbeFraction, seed = 42L)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("m"))
      .head()
    val estHottest =
      (if (row.isNullAt(0)) 0L else row.getLong(0)) / ProbeFraction
    math.min(MaxSalt.toLong,
      math.max(1L, math.ceil(estHottest / targetRowsPerSlot.toDouble).toLong)).toInt
  }

  private def revenueAgg(joined: DataFrame): DataFrame =
    joined.groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))

  /** The manual salting rewrite over arbitrary lineitem/orders frames —
    * the exact plan q28 registers, factored so the scale-stress harness
    * times THIS code path (not a re-spelling) against [[plainRevenue]].
    * Salt count comes from [[probedSalt]] over the probe (fact) side
    * unless the caller pins one via `saltOverride` (the stress harness
    * deliberately exercises the probe-derived production path). */
  private[graft] def saltedRevenue(li0: DataFrame, o0: DataFrame,
      saltOverride: Option[Int] = None): DataFrame = {
    val salt = saltOverride.getOrElse(probedSalt(li0, "l_orderkey"))
    // salt == 1 IS the plain join: adding a constant salt column and a
    // sequence(0,0) explode would leave a Generate node (and a wider join
    // key) in a plan whose probe just proved there is no skew — the
    // zero-tax claim is pinned as a plan invariant (no Generate on the
    // uniform TPC-H corpus, PlanInvariantsSpec), not a scaladoc sentence
    if (salt == 1) return plainRevenue(li0, o0)
    // the salt coordinate must have >= salt distinct values among the hot
    // key's rows or the extra slots are pure dead replication:
    // pmod(l_linenumber, salt) capped the split at l_linenumber's 7
    // distinct values, silently wasting every probed salt > 7 (r15
    // review). A row-content hash spreads any hot key across all `salt`
    // slots; rows that are FULL duplicates share a slot by construction
    // (the price of determinism — no rand() under retries).
    val li = li0.withColumn("salt",
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice")), lit(salt.toLong)))
    val o = o0.withColumn("salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    revenueAgg(li.join(o,
      li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt")))
  }

  /** The naive equi-join with the same aggregate — the semantics oracle
    * and the single-reducer baseline the salted rewrite is measured
    * against. */
  private[graft] def plainRevenue(li: DataFrame, o: DataFrame): DataFrame =
    revenueAgg(li.join(o, li("l_orderkey") === o("o_orderkey")))

  val saltedJoin = GraftQuery(
    "q28_salted_join",
    (s, dir) => saltedRevenue(
      Tables.t(s, dir, "lineitem"), Tables.t(s, dir, "orders")),
    Some("""SELECT o_orderpriority,
            round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
            count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val all: Seq[GraftQuery] = Seq(saltedJoin)
}
