package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Rows for the streaming SCD2 maintainer. Top-level so the generated
  * encoders resolve accessors (the FfEvent constraint). Days are epoch
  * days (LocalDate.toEpochDay) — integer arithmetic end to end. */
final case class Scd2Event(user_id: Long, day: Int, ts_us: Long, event_id: Long,
    state: String)

/** A SEALED validity interval: half-open [valid_from_day, valid_to_day).
  * Only sealed intervals are emitted (Append-mode discipline: every output
  * row is immutable); the open current interval lives in the state store
  * and is served at read time — the same stored-vs-at-read split as
  * [[SegmentTracker]]. */
final case class Scd2Out(user_id: Long, state: String, valid_from_day: Int,
    valid_to_day: Int)

/** Keyed state: the pending (not yet finalized) day's argmax-by-(ts, id)
  * state, plus the open run. `has_run` is false until the first day
  * finalizes. */
final case class Scd2State(cur_day: Int, cur_ts: Long, cur_id: Long,
    cur_state: String, run_state: String, run_from: Int, has_run: Boolean)

/** STREAMING SCD TYPE-2 MAINTAINER — the ingest-time twin of the batch
  * `ev_scd2_state_history` query, on the state-v2 `transformWithState`
  * API: each user's state store holds the current (state, valid_from) run
  * plus the in-flight day; when a later day finalizes with a DIFFERENT
  * daily state, the closed interval [run_from, change_day) is emitted and
  * the new run opens at the change day. This completes the feature-store
  * triangle (SCD2 history -> point-in-time join -> segment tracker) in
  * both batch and streaming modes.
  *
  * Daily-state semantics match the batch query exactly: a day's state is
  * its LAST event's type under (ts, event_id) order — maintained here as
  * a per-day ARGMAX, which is commutative, so within-day arrival order
  * never matters. Ordering contract across days: per-key non-decreasing
  * `day` ACROSS batches (the key-partitioned Kafka contract, same as
  * [[ForwardFill]]); WITHIN a micro-batch the group sorts by
  * (day, ts_us, event_id) first, repairing any within-batch shuffle. A
  * cross-batch day regression fails loudly rather than corrupting
  * history.
  *
  * A day can only finalize when a later day arrives, so the tail of each
  * user's history (pending day + open run) stays in state until the next
  * event — a real deployment seals it with day-advancing heartbeats, and
  * Scd2TrackerSpec's flush sentinel plays that role.
  *
  * Scale: state per key is one fixed-width row (two small strings + five
  * numbers) regardless of traffic; emissions are change-days only. The
  * spec pins stream == batch closed intervals on the real events table
  * under randomized chopping + within-day shuffling. */
object Scd2Tracker {
  def run(ds: Dataset[Scd2Event]): Dataset[Scd2Out] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new Scd2Processor, TimeMode.None(), OutputMode.Append())
  }
}

final class Scd2Processor extends StatefulProcessor[Long, Scd2Event, Scd2Out] {

  @transient private var state: ValueState[Scd2State] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Scd2State]("scd2_state",
      Encoders.product[Scd2State], TTLConfig.NONE)

  /** Fold the finalized pending day into the run; seal on change. */
  private def finalizeDay(user: Long, s: Scd2State,
      out: scala.collection.mutable.Builder[Scd2Out, Seq[Scd2Out]]): Scd2State =
    if (!s.has_run)
      s.copy(run_state = s.cur_state, run_from = s.cur_day, has_run = true)
    else if (s.cur_state != s.run_state) {
      out += Scd2Out(user, s.run_state, s.run_from, s.cur_day)
      s.copy(run_state = s.cur_state, run_from = s.cur_day)
    } else s

  override def handleInputRows(user: Long, rows: Iterator[Scd2Event],
      timers: TimerValues): Iterator[Scd2Out] = {
    var s = if (state.exists()) state.get() else null
    val out = Seq.newBuilder[Scd2Out]
    rows.toSeq.sortBy(e => (e.day, e.ts_us, e.event_id)).foreach { e =>
      if (s == null)
        s = Scd2State(e.day, e.ts_us, e.event_id, e.state, "", 0, has_run = false)
      else if (e.day == s.cur_day) {
        if (e.ts_us > s.cur_ts || (e.ts_us == s.cur_ts && e.event_id > s.cur_id))
          s = s.copy(cur_ts = e.ts_us, cur_id = e.event_id, cur_state = e.state)
      } else if (e.day > s.cur_day) {
        s = finalizeDay(user, s, out)
        s = s.copy(cur_day = e.day, cur_ts = e.ts_us, cur_id = e.event_id,
          cur_state = e.state)
      } else
        throw new IllegalStateException(
          s"Scd2Tracker: day regression for user $user (${e.day} after " +
            s"${s.cur_day}) — per-key days must be non-decreasing across batches")
    }
    state.update(s)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[Scd2Out] = Iterator.empty
}
