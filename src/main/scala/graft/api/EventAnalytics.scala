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

  private def threeCol(df: DataFrame, shape: String): DataFrame = {
    require(df.columns.length == 3,
      s"expected a three-column $shape frame, got ${df.columns.length} columns")
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
}
