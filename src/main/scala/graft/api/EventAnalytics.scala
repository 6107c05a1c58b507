package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** PUBLIC event-analytics facade over arbitrary event DataFrames — the
  * library surface for the engine's event-time family (the registry's
  * ev_* queries demonstrate the same algorithms on the fixture event log;
  * this is what a user running their own events calls). Column
  * conventions are positional (`toDF` renames), so any source schema
  * works; all functions are single-shuffle key-partitioned shapes that
  * scale with the corpus. Same code as the registry queries (`EventOps`'s
  * helpers), re-exported with public contracts. The same expressions run
  * unchanged under Structured Streaming inside foreachBatch; the windowed
  * aggregates also run natively on a stream (complete mode as-is — pinned
  * by EventAnalyticsSpec — or append mode after the caller adds a
  * watermark on the ts column, which session_window requires). */
object EventAnalytics {

  /** Is a cast of this type to LONG lossless? The integral primitives,
    * plus DECIMAL(p ≤ 18, 0) — the shape JDBC ingests hand back for
    * NUMBER(n,0) columns (r17 second review: a typeName allowlist of the
    * four primitives rejected decimal ids the old cast handled exactly).
    * decimal(19+,0) stays rejected: its range exceeds Long and the cast
    * CAN overflow. Shared by the stateful-detector facades whose state
    * rows are keyed by longs. */
  private[graft] def integralLike(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.ByteType => true
    case _: org.apache.spark.sql.types.ShortType => true
    case _: org.apache.spark.sql.types.IntegerType => true
    case _: org.apache.spark.sql.types.LongType => true
    case d: org.apache.spark.sql.types.DecimalType =>
      d.scale == 0 && d.precision <= 18
    case _ => false
  }

  private def threeCol(df: DataFrame, shape: String): DataFrame = {
    require(df.columns.length == 3,
      s"expected a three-column $shape frame, got ${df.columns.length} columns")
    df
  }

  private def fourCol(df: DataFrame, shape: String): DataFrame = {
    require(df.columns.length == 4,
      s"expected a four-column $shape frame, got ${df.columns.length} columns")
    df
  }

  /** Session-window aggregate: one row per (user, session) at the given
    * inactivity gap — sessions merge while the next event lands strictly
    * inside [start, last + gap).
    * @param events (user_id, ts, value) — any column names
    * @return (user_id, session_start, n_events, sum_value) */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    EventOps.sessionAgg(
      threeCol(events, "(user_id, ts, value)").toDF("user_id", "ts", "value"),
      gap)

  /** Event-time windowed counts and 4dp value sums per kind; `step` ==
    * `size` (the default) is tumbling, smaller steps slide.
    * @param events (kind, ts, value) — any column names
    * @return (w_start, event_type, n, sum_value) */
  def windowedCounts(events: DataFrame, size: String = "1 hour",
      step: String = ""): DataFrame =
    EventOps.windowAgg(
      threeCol(events, "(kind, ts, value)").toDF("event_type", "ts", "value"),
      size, if (step.isEmpty) size else step)

  /** As-of join: for each left row, the latest right timestamp of the same
    * key at-or-before it (right rows at an equal ts count). The
    * scale-friendly construction: union both sides, ONE shuffle on the
    * key, sort within partition, carry the last right ts forward — no
    * row-exploding range join.
    * @param left  (key, ts, id) — rows to annotate
    * @param right (key, ts) — the reference stream
    * @return (lid, k, ts, asof_ts); left rows with no prior right dropped */
  def asOfJoin(left: DataFrame, right: DataFrame): DataFrame = {
    require(right.columns.length == 2,
      s"expected a two-column (key, ts) right frame, got ${right.columns.length} columns")
    EventOps.asofLatest(threeCol(left, "(key, ts, id)"), right)
  }

  /** Two-step funnel: users whose first `firstStep` event precedes their
    * last `thenStep` event, with both step counts — the conversion set a
    * funnel report is built from.
    * @param events (user_id, event_type, ts) — any column names
    * @return (user_id, n_first, n_then) */
  def funnel(events: DataFrame, firstStep: String, thenStep: String): DataFrame =
    EventOps.funnelCounts(
      threeCol(events, "(user_id, event_type, ts)")
        .toDF("user_id", "event_type", "ts"),
      firstStep, thenStep)

  /** Forward fill (last observation carried forward): every row carries
    * the most recent non-null value of the same key in (ts, id) order —
    * the standard time-series repair step before windowed aggregation.
    * One shuffle (by key), one ordered window pass; no self-join.
    * @param events (id, key, ts, value) — any column names; null values
    *               are the gaps to fill
    * @return (event_id, user_id, v, filled), unordered (the facades never
    *         inherit the registry's oracle ORDER BY — sort at the edge) */
  def forwardFill(events: DataFrame): DataFrame =
    EventOps.forwardFillOn(
      fourCol(events, "(id, key, ts, value)")
        .toDF("event_id", "user_id", "ts", "v"))

  /** Regular-grid resample: per key, instants from the first to the last
    * observation every `stepSeconds`, each grid point valued by LOCF
    * (default) or by linear interpolation between its surrounding
    * observations (`linear = true`; holds past the last one, the `mode`
    * column says which). One union + one keyed ordered pass — no
    * self-join, no per-grid-point probe.
    * @param events (id, key, ts, value) — any column names
    * @return LOCF: (user_id, grid_ts, v_filled);
    *         linear: (user_id, grid_ts, v_interp, mode) */
  def resample(events: DataFrame, stepSeconds: Long = 21600L,
      linear: Boolean = false): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val ev = fourCol(events, "(id, key, ts, value)")
      .toDF("event_id", "user_id", "ts", "v")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("v").cast("double").as("v"))
    if (linear) EventOps.resampleLinearOn(ev, stepSeconds * 1000000L)
    else EventOps.resampleLocfOn(ev, stepSeconds * 1000000L)
  }

  /** Per-key rate limiting: keep at most `maxPer` events per key per
    * calendar `per` unit ("day", "hour", "week", …) in (ts, id) order —
    * the quota/throttle gate every ingest pipeline runs. One ranked
    * window per (key, window) partition; no self-join.
    * @param events (id, key, ts) — any column names
    * @return (event_id, user_id, window_start): the kept rows */
  def rateLimit(events: DataFrame, maxPer: Int = 2,
      per: String = "day"): DataFrame = {
    require(maxPer > 0, s"maxPer must be positive, got $maxPer")
    EventOps.rateLimitOn(
      threeCol(events, "(id, key, ts)").toDF("event_id", "user_id", "ts"),
      maxPer, per)
  }

  /** Per-group z-score anomaly flags: rows whose |z| against their
    * group's mean/std clears `threshold`. The group stats come from
    * exact integer-scaled sums (map-side partial aggregation applies;
    * the tiny stats table broadcasts back), so results are independent
    * of aggregation order. Constant groups (std = 0) are dropped.
    * @param events (id, group, value) — any column names
    * @return (event_id, event_type, value_r, z), unordered */
  def anomalyZScore(events: DataFrame, threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    EventOps.anomalyZscoreOn(
      threeCol(events, "(id, group, value)")
        .toDF("event_id", "event_type", "value")
        .withColumn("value", col("value").cast("double")),
      threshold)
  }

  /** Weekly cohort retention: users bucketed by first-seen week, counted
    * per (cohort week, weeks-since-cohort) offset — the classic
    * retention triangle. Two key-partitioned aggregates and one join.
    * @param events (key, ts) — any column names
    * @return (cohort_week, week_offset, n_users) */
  def cohortRetention(events: DataFrame): DataFrame = {
    require(events.columns.length == 2,
      s"expected a two-column (key, ts) frame, got ${events.columns.length} columns")
    EventOps.cohortRetentionOn(events.toDF("user_id", "ts"))
  }

  /** Strict ordered 3-step funnel: step 2 must follow the user's FIRST
    * step-1 event, step 3 the resulting step-2 anchor — the dashboard
    * conversion table with step-over-step and step-over-top rates
    * (exact integer micro-rates; [[funnel]] is the 2-event reduction).
    * Anchors chain through per-user window minimums in ONE keyed pass.
    * @param events (key, type, ts) — any column names
    * @return (step, gate, n_users, conv_step_micro, conv_total_micro) */
  def funnelSteps(events: DataFrame, step1: String, step2: String,
      step3: String): DataFrame =
    EventOps.funnelStepsOn(
      threeCol(events, "(key, type, ts)").toDF("user_id", "event_type", "ts"),
      step1, step2, step3)

  /** Event-type transition matrix: (state → next state) hop counts per
    * key in event-time order — the Markov-chain view behind next-action
    * analyses. One keyed shuffle for the lead() pass, then a
    * partial-aggregated count into ≤ |types|² groups.
    * @param events (id, key, ts, type) — any column names
    * @return (event_type, next_type, n) */
  def transitionMatrix(events: DataFrame): DataFrame =
    EventOps.transitionMatrixOn(
      fourCol(events, "(id, key, ts, type)")
        .toDF("event_id", "user_id", "ts", "event_type"))

  /** First-touch attribution: each `conversion` event credits the event
    * type of its key's FIRST-ever event (the (ts, id) determinism
    * contract breaks ties). One ranked window + one keyed join; shares
    * are exact integer micro-rates.
    * @param events (id, key, ts, type) — any column names
    * @return (first_touch, n_users, n_purchases, share_micro) */
  def firstTouchAttribution(events: DataFrame,
      conversion: String): DataFrame =
    EventOps.firstTouchOn(
      fourCol(events, "(id, key, ts, type)")
        .toDF("event_id", "user_id", "ts", "event_type"),
      conversion)

  // ------------------------------------------------------- alerting family

  /** CEP pair detection (batch window form): for every `second` event,
    * the latest strictly-earlier `first` by the same key within
    * `withinSeconds` — "purchase after click", "ack after alarm". One
    * keyed window pass over the two event types; no self-join. The
    * streaming twin is graft.streaming.Cep.detect (same latest-first-wins
    * + gap > 0 semantics, pinned equal by CepBatchParitySpec).
    * @param events (key, type, ts) — any column names
    * @return (user_id, first_ts, second_ts, gap_ms) */
  def cepPairs(events: DataFrame, first: String, second: String,
      withinSeconds: Long = 300L): DataFrame = {
    require(withinSeconds > 0,
      s"withinSeconds must be positive, got $withinSeconds")
    EventOps.cepPairsOn(
      threeCol(events, "(key, type, ts)").toDF("user_id", "event_type", "ts"),
      first, second, withinSeconds)
  }

  /** Ordered multi-step CEP sequence: non-overlapping, greedy
    * earliest-start matches of `steps` in strict event-time order, the
    * whole chain inside `withinSeconds` of its first step. Streaming
    * frames run the stateful detector (watermark-expired partials drop);
    * batch frames run the SAME single-event automaton
    * (graft.streaming.Cep.stepChain — the two legs cannot drift) over a
    * secondary sort: one keyed shuffle, per-partition (key, ts) order,
    * one sequential pass with constant per-task state — a hot key costs
    * time, never executor memory. Keys are compared as strings (cast
    * from any type). Equal-timestamp events SPLIT ACROSS micro-batches
    * process in arrival order, which can differ from the batch leg's
    * (ts, etype) tie-break — a chain-start decision on such a tie may
    * differ between the legs (Cep.stepChain documents why); the batch
    * leg is canonical for sub-timestamp-resolution bursts.
    * @param events (key, type, ts) — any column names
    * @return (key, start_ts, end_ts) one row per completed chain */
  def cepSequence(events: DataFrame, steps: Seq[String],
      withinSeconds: Long = 300L): DataFrame = {
    require(withinSeconds > 0,
      s"withinSeconds must be positive, got $withinSeconds")
    val named = threeCol(events, "(key, type, ts)").toDF("key", "etype", "ts")
    // NEVER cast an already-timestamp ts column: a cast projection strips
    // the event-time watermark tag the caller's withWatermark() attached
    // (a bare rename keeps it), so the streaming leg's EventTimeTimeout
    // would be rejected at query start — reproduced and spec-pinned
    // (r16 review finding 1). A streaming frame with a watermark always
    // carries TimestampType here, so the cast only ever fires on batch
    // frames with date/string ts columns.
    // TIMESTAMP_NTZ can carry a watermark too (Spark 3.4+), but the
    // detector's encoder needs TimestampType and the NTZ→TIMESTAMP cast
    // would strip the tag just like any cast — fail with a named contract
    // error instead of the opaque start-time rejection (r16 second review)
    require(!(named.isStreaming && named.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType),
      "cepSequence needs a TIMESTAMP (with time zone) event-time column " +
        "on streaming frames — cast the NTZ column and re-apply " +
        "withWatermark upstream")
    val tsCol =
      if (named.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType) col("ts")
      else col("ts").cast("timestamp")
    val ev = named.select(col("key").cast("string").as("key"),
      col("etype").cast("string").as("etype"), tsCol.as("ts"))
    val spark = ev.sparkSession
    import spark.implicits._
    val ds = ev.as[graft.streaming.Cep.CepEvent]
    val matches =
      if (ev.isStreaming)
        graft.streaming.Cep.detectSequence(ds, steps, withinSeconds * 1000L)
      else
        graft.streaming.Cep.detectSequenceBatch(ds, steps,
          withinSeconds * 1000L)
    matches.toDF("key", "start_ts", "end_ts")
  }

  /** Absence detection (batch window form): every `first` never answered
    * by a `second` from the same key within `withinSeconds` — cart
    * abandonment, missed heartbeats, unacked alarms. One forward-looking
    * keyed RANGE frame; no self-join. The streaming twin is
    * graft.streaming.Cep.detectAbsence (alerts fire as the watermark or a
    * later event proves the deadline passed).
    * @param events (key, type, ts) — any column names
    * @return (user_id, first_ts, deadline_ts) */
  def absence(events: DataFrame, first: String, second: String,
      withinSeconds: Long = 300L): DataFrame = {
    require(withinSeconds > 0,
      s"withinSeconds must be positive, got $withinSeconds")
    EventOps.absenceOn(
      threeCol(events, "(key, type, ts)").toDF("user_id", "event_type", "ts"),
      first, second, withinSeconds)
  }

  /** Robust (median/MAD) outlier profile per group — the median-based twin
    * of [[anomalyZScore]] for series where outliers drag the mean-based
    * threshold. Values scale to exact integer micros; medians and doubled
    * absolute deviations stay exact, so the profile is
    * aggregation-order-free. Two grouped exact-median passes with the tiny
    * per-group medians broadcast back.
    * @param events (group, value) — any column names
    * @param k      outlier threshold in MADs (|v − median| > k·MAD)
    * @return (event_type, n, median_micro, mad_micro, n_outliers) */
  def anomalyMad(events: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(events.columns.length == 2,
      s"expected a two-column (group, value) frame, got ${events.columns.length} columns")
    EventOps.anomalyMadOn(
      events.toDF("event_type", "v0")
        .select(col("event_type"),
          expr("cast(floor(cast(v0 as double) * 1e6 + 0.5) as bigint)").as("v")),
      k)
  }

  /** Offline CUSUM change-point location per key: the split index
    * maximizing the cumulative deviation |n·prefix_k − k·total| — the
    * classic level-shift locator, in exact integer arithmetic over
    * 1e6-scaled values. Keys need `minN` observations to report (CUSUM on
    * shorter series is noise). One keyed shuffle, two ordered window
    * passes. The ingest-time counterpart is [[pageHinkley]].
    * @param events (id, key, ts, value) — any column names
    * @return (user_id, n_events, cp_index, cp_ts, cusum_stat) */
  def cusumChangepoint(events: DataFrame, minN: Int = 8): DataFrame = {
    require(minN >= 2, s"minN must be >= 2, got $minN")
    EventOps.changepointOn(
      fourCol(events, "(id, key, ts, value)")
        .toDF("event_id", "user_id", "ts", "v0")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("cast(floor(cast(v0 as double) * 1e6 + 0.5) as bigint)").as("v6")),
      minN)
  }

  /** Page-Hinkley ONLINE drift detection per key — the sequential
    * counterpart of [[cusumChangepoint]] (which sees the whole series and
    * places the single best split): maintain the cumulative deviation
    * against its running minimum and alarm when the gap exceeds `lambda`.
    * Runs the same stateful fold on a bounded frame (one pass) and on a
    * stream (state across micro-batches); updates apply in per-key
    * (ts, id) order, so emissions are deterministic. Ids and keys must be
    * integral (the state row is (long, long, ts, double)); null values
    * are skipped. Memory note: the fold buffers one (key, group) at a
    * time — per micro-batch on a stream (trigger-bounded), the key's
    * WHOLE series on a bounded frame; for corpus-scale batch drift scans
    * prefer [[cusumChangepoint]] (window-based, never buffers) or run
    * the stream form over the replayed log.
    * @param events (id, key, ts, value) — any column names
    * @param delta  per-observation drift allowance
    * @param lambda alarm threshold on the PH statistic
    * @return (event_id, user_id, n_seen, ph, alarm, ts) */
  def pageHinkley(events: DataFrame, delta: Double = 0.005,
      lambda: Double = 50.0): DataFrame = {
    require(lambda > 0, s"lambda must be positive, got $lambda")
    val ev0 = fourCol(events, "(id, key, ts, value)")
      .toDF("event_id", "user_id", "ts", "v")
    for (c <- Seq("event_id", "user_id")) {
      val t = ev0.schema(c).dataType
      require(integralLike(t),
        s"pageHinkley needs an integral (or decimal(<=18,0)) $c, " +
          s"got ${t.typeName}")
    }
    val ev = ev0.select(col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"),
      col("v").cast("double").as("v"))
    val spark = ev.sparkSession
    import spark.implicits._
    graft.streaming.PageHinkley.detect(
      ev.as[graft.streaming.FfEvent], delta, lambda).toDF()
  }

  // -------------------------------------------------- experimentation family

  /** Per-unit (variant, converted) arm flags shared by [[abLift]] and
    * [[powerAnalysis]]: rows whose variant string-equals `control` are
    * arm 0 (A), everything else arm 1 (B). Validated EAGERLY (one
    * aggregate over the assignment frame — cheap next to the readout it
    * feeds): null variants, null/unparseable `converted` values, a
    * control value matching no row (the classic case-mismatch), or an
    * empty treatment arm would otherwise return an all-null z-test row —
    * or, worse for `converted`, silently bias the readout (sum() skips
    * nulls, so a dirty conversion column reads as "didn't convert") —
    * instead of the facade family's named contract error (r16 review
    * finding 2; null-conv arm r16 advisor). */
  private def armFlags(assignments: DataFrame, control: String): DataFrame = {
    val a = threeCol(assignments, "(unit, variant, converted)")
      .toDF("unit", "variant0", "conv0")
    val flags = a.select(
      when(col("variant0").cast("string") === control, 0L).otherwise(1L)
        .as("variant"),
      // try_cast, not cast: under ANSI an unparseable converted value
      // would throw Spark's opaque cast error mid-aggregate; try_cast
      // funnels it to null so the eager check below reports it as THIS
      // facade's named contract error in both ANSI modes
      expr("try_cast(conv0 as boolean)").cast("long").as("conv"),
      col("variant0").isNull.cast("long").as("vnull"))
    val c = flags.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"),
      sum(col("vnull")).as("nn"), count(lit(1)).as("n"),
      sum(col("conv").isNull.cast("long")).as("cn")).head()
    require(c.getLong(3) > 0, "experiment readouts need a non-empty assignment frame")
    require(c.getLong(2) == 0,
      s"${c.getLong(2)} null variant values — fix the assignment join before reading the experiment")
    require(c.getLong(4) == 0,
      s"${c.getLong(4)} null or non-boolean converted values — a null is NOT a non-conversion; clean the conversion column before reading the experiment")
    require(c.getLong(0) > 0,
      s"control variant '$control' matched no assignment row (case mismatch?)")
    require(c.getLong(1) > 0,
      s"every assignment row matched control '$control' — no treatment arm to compare")
    flags.select(col("variant"), col("conv"))
  }

  /** A/B experiment readout — the two-proportion z-test: per-arm counts,
    * exact integer micro-rates, relative lift of B over A, and the pooled
    * z-score (sqrt is IEEE-correctly-rounded, so the statistic is
    * engine-identical, floored to micros). One aggregation collapses the
    * units; everything after runs on one row.
    * @param assignments (unit, variant, converted) — any column names;
    *                    converted coerces via boolean (a null or
    *                    unparseable value is a named contract error,
    *                    never a silent non-conversion)
    * @param control     the variant value that is arm A (string-compared)
    * @return one row: (n_a, c_a, n_b, c_b, p_a_micro, p_b_micro,
    *         rel_lift_micro, z_micro) */
  def abLift(assignments: DataFrame, control: String): DataFrame =
    EventOps.abLiftOn(armFlags(assignments, control))

  /** Experiment power / MDE planning over the SAME assignment frame as
    * [[abLift]]: with the observed pooled rate and arm sizes, the minimum
    * detectable effect at α=5%/power=80%, and the per-arm sample size a
    * 5%-relative-lift detection would need — "is this experiment worth
    * running at our traffic".
    * @return one row: (n_a, n_b, n_conv, p_bar_micro, mde_micro,
    *         n_per_arm_for_5pct_lift) */
  def powerAnalysis(assignments: DataFrame, control: String): DataFrame =
    EventOps.powerAnalysisOn(armFlags(assignments, control))

  /** CUPED variance-reduction readout (Deng et al. 2013): ρ² between each
    * unit's pre-period covariate and experiment metric — exactly the
    * variance CUPED removes — plus the effective-sample-size multiplier
    * 1/(1−ρ²). Values scale to exact integer cents; the five moments
    * accumulate as DECIMAL(38,0), so aggregation order cannot flip a bit;
    * ρ² = 1 and zero-variance inputs yield null rather than a division
    * error.
    * @param pairs (unit, preMetric, metric) — any column names
    * @return one row: (n_users, rho2_micro, ess_mult_micro) */
  def cupedReadout(pairs: DataFrame): DataFrame =
    EventOps.cupedOn(
      threeCol(pairs, "(unit, preMetric, metric)").toDF("unit", "x0", "y0")
        .select(
          expr("cast(floor(cast(x0 as double) * 100 + 0.5) as bigint)").as("x"),
          expr("cast(floor(cast(y0 as double) * 100 + 0.5) as bigint)").as("y")))

  /** Cohort LTV curves: units grouped by first-event week, every cent
    * credited to its (cohort, age-in-weeks) cell, and the cohort-keyed
    * cumulative revenue — the lifetime-value table growth models fit to.
    * Weeks are epoch-day floor-divs (post-1970 timestamps assumed).
    * @param events (key, ts, value) — any column names
    * @return (cohort_week, age_weeks, n_active, revenue_cents,
    *         cum_revenue_cents) */
  def ltvCohort(events: DataFrame): DataFrame =
    EventOps.ltvCohortOn(
      threeCol(events, "(key, ts, value)").toDF("user_id", "ts", "v")
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000 div 7")
            .as("week"),
          expr("cast(floor(cast(v as double) * 100 + 0.5) as bigint)")
            .as("cents")))

  /** SCD2 (slowly-changing-dimension type 2) state history per key: each
    * day's LAST state wins, consecutive equal days collapse into one
    * (valid_from, valid_to] interval, the open interval is flagged
    * current — the history table every point-in-time join reads. Every
    * window is key-partitioned.
    * @param events (key, ts, id, state) — any column names
    * @return (user_id, state, valid_from, valid_to, is_current) */
  def scd2History(events: DataFrame): DataFrame =
    EventOps.scd2IntervalsOn(
      fourCol(events, "(key, ts, id, state)")
        .toDF("user_id", "ts", "event_id", "state"))
      .select(col("user_id"), col("state"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
}
