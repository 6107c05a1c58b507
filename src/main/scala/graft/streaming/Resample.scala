package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Rows for the streaming resampler (top-level for encoder codegen). */
final case class GridOut(user_id: Long, grid_ms: Long, v: Option[Double])
final case class RsState(carry: Option[Double], nextG: Option[Long])

/** STREAMING TIME-SERIES RESAMPLER — the ingest-time counterpart of the
  * batch `ev_resample_grid` query: each key emits epoch-aligned grid rows
  * carrying the last observation at each grid instant, driven by
  * EVENT-TIME TIMERS (state-v2 `transformWithState`), so grid points keep
  * flowing even while a key receives no data — the watermark passing a
  * grid instant is what releases it, the reference's
  * onWatermarkProgress-driven emission in its purest form.
  *
  * Semantics match the batch query: the first grid instant is the first
  * event's time rounded UP to the step; an event AT a grid instant applies
  * before that instant emits. Grid points between two events of one batch
  * emit inline; points past the batch's events emit from the timer once
  * the watermark passes them. The `nextG` cursor in state makes emission
  * exactly-once regardless of how input-row and timer processing interleave.
  *
  * Same per-key ordering contract as [[ForwardFill]]; state per key is one
  * double + one long. */
object Resample {
  def run(ds: Dataset[FfEvent], stepMs: Long): Dataset[GridOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new ResampleProcessor(stepMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

final class ResampleProcessor(stepMs: Long)
    extends StatefulProcessor[Long, FfEvent, GridOut] {

  @transient private var state: ValueState[RsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[RsState]("rs_state",
      implicitly[Encoder[RsState]](Encoders.product[RsState]), TTLConfig.NONE)

  private def emitThrough(s: RsState, limit: Long, key: Long,
      out: scala.collection.mutable.Builder[GridOut, _]): RsState = {
    var cur = s
    while (cur.nextG.exists(_ <= limit)) {
      out += GridOut(key, cur.nextG.get, cur.carry)
      cur = cur.copy(nextG = Some(cur.nextG.get + stepMs))
    }
    cur
  }

  override def handleInputRows(key: Long, rows: Iterator[FfEvent],
      timers: TimerValues): Iterator[GridOut] = {
    var s = if (state.exists()) state.get() else RsState(None, None)
    val out = Seq.newBuilder[GridOut]
    rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val t = e.ts.getTime
      if (s.nextG.isEmpty)
        s = s.copy(nextG = Some(((t + stepMs - 1) / stepMs) * stepMs))
      // grid instants strictly before this event emit the pre-event carry
      s = emitThrough(s, t - 1, key, out)
      s = s.copy(carry = e.v.orElse(s.carry))
    }
    // re-arm the single rolling timer at the next pending grid instant
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    s.nextG.foreach(getHandle.registerTimer)
    state.update(s)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[GridOut] = {
    var s = state.get()
    val out = Seq.newBuilder[GridOut]
    s = emitThrough(s,
      math.max(info.getExpiryTimeInMs(), timers.getCurrentWatermarkInMs()), key, out)
    s.nextG.foreach(getHandle.registerTimer)
    state.update(s)
    out.result().iterator
  }
}
