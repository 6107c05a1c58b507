package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Rows for the streaming interpolator (top-level for encoder codegen). */
final case class InterpOut(user_id: Long, grid_ms: Long, v: Double)
final case class ItState(prevT: Option[Long], prevV: Option[Double], nextG: Option[Long])

/** STREAMING LINEAR INTERPOLATION — the ingest-time counterpart of the
  * batch `ev_resample_interpolate` query: each key emits epoch-aligned grid
  * rows carrying the TIME-WEIGHTED value between its surrounding
  * observations. Unlike [[Resample]]'s LOCF (which a watermark timer can
  * release), an interpolated instant needs the NEXT observation, so
  * emission is purely event-driven: pending grid instants release when the
  * observation after them arrives — no timers, and no 'hold' tail (a
  * stream never knows an observation is the last; the batch twin's hold
  * row at the final event IS emitted here, as the exact-hit case).
  *
  * Value parity with the batch query is bit-exact: the per-instant formula
  * is the identical op tree (one divide, one multiply, one add), and an
  * event AT a grid instant contributes its value directly, no arithmetic.
  * Null observations carry no value and neither anchor nor emit.
  *
  * Parity SCOPE (ADVICE r9): the stream's grid is bounded by VALUED
  * observations — the batch twin bounds its grid by min/max ts over ALL
  * events, so when a key's earliest or latest events are null-valued the
  * batch query emits extra rows the stream never will: null-'interp' grid
  * rows before the first valued observation, and 'hold' rows out to a
  * trailing null event. Parity claims (StreamingInterpolateSpec) therefore
  * apply to grid instants inside [first valued obs, last valued obs]; the
  * spec pins the divergence case explicitly.
  *
  * Same per-key ordering contract as [[ForwardFill]]/[[Resample]]; state
  * per key is two longs + one double. */
object Interpolate {
  def run(ds: Dataset[FfEvent], stepMs: Long): Dataset[InterpOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new InterpolateProcessor(stepMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

final class InterpolateProcessor(stepMs: Long)
    extends StatefulProcessor[Long, FfEvent, InterpOut] {

  @transient private var state: ValueState[ItState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ItState]("it_state",
      implicitly[Encoder[ItState]](Encoders.product[ItState]), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[FfEvent],
      timers: TimerValues): Iterator[InterpOut] = {
    var s = if (state.exists()) state.get() else ItState(None, None, None)
    val out = Seq.newBuilder[InterpOut]
    // valued observations in (ts, event_id) order, then grouped into runs
    // of equal ts: the batch leg's ordered window sees the FIRST of a run
    // as the next-anchor for instants before it and the LAST as both the
    // exact-hit value and the prev-anchor afterwards — mirror that here.
    // (A run split across micro-batches is outside the ordering contract,
    // like any other out-of-order delivery.)
    val obs = rows.toSeq.filter(_.v.isDefined)
      .sortBy(e => (e.ts.getTime, e.event_id))
      .map(e => (e.ts.getTime, e.v.get))
    var i = 0
    while (i < obs.length) {
      var j = i + 1
      while (j < obs.length && obs(j)._1 == obs(i)._1) j += 1
      val t = obs(i)._1
      val vFirst = obs(i)._2
      val vLast = obs(j - 1)._2
      if (s.nextG.isEmpty)
        s = s.copy(nextG = Some(((t + stepMs - 1) / stepMs) * stepMs))
      (s.prevT, s.prevV) match {
        case (Some(t0), Some(v0)) =>
          // instants strictly between the anchors interpolate — the
          // ev_resample_interpolate op tree, bit for bit
          while (s.nextG.exists(_ < t)) {
            val g = s.nextG.get
            out += InterpOut(key, g,
              v0 + (vFirst - v0) * ((g - t0).toDouble / (t - t0).toDouble))
            s = s.copy(nextG = Some(g + stepMs))
          }
        case _ => () // first observation: no earlier anchor, nothing between
      }
      if (s.nextG.contains(t)) { // exact hit: the run's last value, raw
        out += InterpOut(key, t, vLast)
        s = s.copy(nextG = Some(t + stepMs))
      }
      // invariant: nextG > t from here, so future pending instants always
      // sit strictly between this run and the next one
      s = s.copy(prevT = Some(t), prevV = Some(vLast))
      i = j
    }
    state.update(s)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[InterpOut] = Iterator.empty
}
