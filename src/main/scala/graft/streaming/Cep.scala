package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Complex-event-processing primitive: detect `first` followed by `second`
  * within `withinMs`, per key, over an event-time stream.
  *
  * This is the streaming twin of the batch `ev_funnel` / `ev_asof_join`
  * queries, built on the same keyed-state machinery as [[StatefulTask]] —
  * the reference expresses the identical pattern as a `PersistentTask`
  * holding the last-seen timestamp per key and reacting to watermark
  * progress (reference: streaming/src/main/scala/io/gearpump/streaming/state/api/PersistentTask.scala:36-98,
  * examples/streaming/complexdag DAG wiring).
  *
  * Semantics:
  *  - a match is emitted on the `second` event when `0 < gap <= withinMs`
  *    against the latest `first` at-or-before it;
  *  - events are folded in EVENT-TIME order within each micro-batch (the
  *    per-key iterator carries no ordering guarantee, so arrival order is
  *    never trusted);
  *  - cross-batch disorder is bounded by the stream's watermark, exactly as
  *    in every other graft streaming operator;
  *  - key state is one long (latest `first` timestamp) GC'd by an
  *    event-time timeout once the watermark passes `withinMs` beyond it —
  *    bounded state at any scale, keys shard across executors by hash.
  */
object Cep {
  final case class CepEvent(key: String, etype: String, ts: Timestamp)
  final case class PatternMatch(key: String, firstTs: Timestamp, secondTs: Timestamp,
      gapMs: Long)

  /** Event time in epoch MICROS — Timestamp.getTime alone would quantize
    * Spark's microsecond TimestampType to milliseconds, so emitted firstTs
    * values would not round-trip (CepBatchParitySpec pins batch/stream
    * timestamp equality). */
  private[streaming] def toUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private[streaming] def usTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** State = epoch-us of the latest `first` event, or MinValue. */
  private[streaming] final class Detector(first: String, second: String, withinMs: Long)
      extends Serializable {
    private val withinUs = withinMs * 1000L

    def process(key: String, rows: Iterator[CepEvent],
        state: GroupState[Long]): Iterator[PatternMatch] = {
      if (state.hasTimedOut) {
        // watermark passed lastFirst + withinMs: no future `second` can match
        state.remove()
        Iterator.empty
      } else {
        var lastFirst = state.getOption.getOrElse(Long.MinValue)
        val out = Seq.newBuilder[PatternMatch]
        rows.toSeq.sortBy(ev => toUs(ev.ts)).foreach { ev =>
          if (ev.etype == first) lastFirst = math.max(lastFirst, toUs(ev.ts))
          else if (ev.etype == second && lastFirst != Long.MinValue) {
            val gap = toUs(ev.ts) - lastFirst
            if (gap > 0 && gap <= withinUs)
              out += PatternMatch(key, usTs(lastFirst), ev.ts, gap / 1000L)
          }
        }
        if (lastFirst == Long.MinValue) state.remove()
        else {
          state.update(lastFirst)
          if (state.getCurrentWatermarkMs() >= 0)
            state.setTimeoutTimestamp(
              math.max(Math.floorDiv(lastFirst, 1000L) + withinMs,
                state.getCurrentWatermarkMs() + 1))
        }
        out.result().iterator
      }
    }
  }

  /** Wire the detector over a (possibly streaming) event dataset. The input
    * must carry a watermark on `ts` when streaming. */
  def detect(events: Dataset[CepEvent], first: String, second: String,
      withinMs: Long): Dataset[PatternMatch] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val d = new Detector(first, second, withinMs)
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Long, PatternMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(d.process _)
  }

  final case class SeqMatch(key: String, startTs: Timestamp, endTs: Timestamp)

  /** ONE automaton step both sequence legs share: advance the (matched
    * steps, chain start, last step ts) state by a single event, emitting
    * a match (and restarting — greedy earliest-start, non-overlapping)
    * when the full chain completes inside `withinUs` of its first step.
    * An event completes at most one chain, so the output is an Option.
    *
    * EQUAL-TIMESTAMP TIE CAVEAT (found live by CepPropertySpec's r17
    * seed): the batch leg canonicalizes equal-ts events by (ts, etype);
    * a STREAM can deliver two equal-ts events in different micro-batches
    * in either order, and a single-pass automaton cannot reorder state
    * already advanced — so a chain whose START hinges on which tied
    * event processes first may differ between the legs (mid-chain
    * advances are immune: `ts > tPrev` is strict, so a tied event never
    * advances a chain). Exact cross-leg tie parity would require
    * buffering events in state until the watermark passes their
    * timestamp — latency the detector deliberately does not spend. The
    * pair/absence detectors have no such transition (all strict
    * inequalities). Corpora with sub-timestamp-resolution bursts should
    * treat the batch leg as canonical. */
  private[streaming] def stepChain(steps: Seq[String], withinUs: Long,
      key: String, ev: CepEvent, state: (Int, Long, Long))
      : (Option[SeqMatch], (Int, Long, Long)) = {
    var (n, t0, tPrev) = state
    val ts = toUs(ev.ts)
    if (n > 0 && ts - t0 > withinUs) { n = 0 } // chain expired
    var out: Option[SeqMatch] = None
    if (n == 0) {
      if (ev.etype == steps.head) { n = 1; t0 = ts; tPrev = ts }
    } else if (ev.etype == steps(n) && ts > tPrev) {
      n += 1; tPrev = ts
      if (n == steps.size) {
        out = Some(SeqMatch(key, usTs(t0), usTs(tPrev)))
        n = 0 // non-overlapping: restart after a full match
      }
    }
    (out, (n, t0, tPrev))
  }

  /** [[stepChain]] folded over a micro-batch's rows in (event-time,
    * etype) order — the streaming [[SeqDetector]]'s per-batch pass (state
    * carried across batches). The etype tie-break makes equal-timestamp
    * delivery order irrelevant, matching [[detectSequenceBatch]]'s sort
    * so the two legs can never drift. */
  private[streaming] def foldChain(steps: Seq[String], withinUs: Long,
      key: String, init: (Int, Long, Long), rows: Seq[CepEvent])
      : (Seq[SeqMatch], (Int, Long, Long)) = {
    var st = init
    val out = Seq.newBuilder[SeqMatch]
    rows.sortBy(ev => (toUs(ev.ts), ev.etype)).foreach { ev =>
      val (m, st2) = stepChain(steps, withinUs, key, ev, st)
      st = st2
      m.foreach(out += _)
    }
    (out.result(), st)
  }

  /** Multi-step chain state: how many steps matched, chain start, last
    * matched step's timestamp. */
  private[streaming] final class SeqDetector(steps: Seq[String], withinMs: Long)
      extends Serializable {
    private val withinUs = withinMs * 1000L

    def process(key: String, rows: Iterator[CepEvent],
        state: GroupState[(Int, Long, Long)]): Iterator[SeqMatch] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val (out, next @ (n, t0, _)) = foldChain(steps, withinUs, key,
          state.getOption.getOrElse((0, 0L, 0L)), rows.toSeq)
        if (n == 0) state.remove()
        else {
          state.update(next)
          if (state.getCurrentWatermarkMs() >= 0)
            state.setTimeoutTimestamp(
              math.max(Math.floorDiv(t0, 1000L) + withinMs,
                state.getCurrentWatermarkMs() + 1))
        }
        out.iterator
      }
    }
  }

  /** Batch leg of [[detectSequence]]: the same [[stepChain]] automaton
    * over a BOUNDED frame, without the watermark machinery (a batch
    * GroupState has no watermark to read, so the streaming wiring cannot
    * run on batch inputs). Dangling partial chains at end-of-frame are
    * dropped, which for a bounded frame is exactly the watermark-expiry
    * semantics of the stream.
    *
    * 100 TB shape: SECONDARY SORT, not flatMapGroups — one shuffle on the
    * key, a per-partition (key, ts, etype) sort, then a single sequential
    * pass whose state is one (Int, Long, Long) triple reset at key
    * boundaries. A key's history is never materialized (the
    * groupByKey + toSeq spelling buffers the whole key in executor
    * memory — a hot key at corpus scale would OOM the task; here it only
    * costs time). Order is total per key, so output is deterministic at
    * any parallelism. */
  def detectSequenceBatch(events: Dataset[CepEvent], steps: Seq[String],
      withinMs: Long): Dataset[SeqMatch] = {
    require(steps.size >= 2, "a sequence pattern needs at least two steps")
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val withinUs = withinMs * 1000L
    events
      .repartition(org.apache.spark.sql.functions.col("key"))
      .sortWithinPartitions("key", "ts", "etype")
      .mapPartitions { it =>
        new Iterator[SeqMatch] {
          private var cur: String = null
          private var st = (0, 0L, 0L)
          private var pending: Option[SeqMatch] = None
          private def advance(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val ev = it.next()
              if (ev.key != cur) { cur = ev.key; st = (0, 0L, 0L) }
              val (m, st2) = stepChain(steps, withinUs, ev.key, ev, st)
              st = st2
              pending = m
            }
          }
          override def hasNext: Boolean = { advance(); pending.nonEmpty }
          override def next(): SeqMatch = {
            advance()
            val m = pending.get; pending = None; m
          }
        }
      }
  }

  /** Ordered multi-step pattern (funnel chain): `steps` must occur in
    * strict event-time order, the whole chain inside `withinMs` of its
    * first step. Greedy earliest-start, non-overlapping matches; partial
    * chains are dropped once the watermark passes start + withinMs. */
  def detectSequence(events: Dataset[CepEvent], steps: Seq[String],
      withinMs: Long): Dataset[SeqMatch] = {
    require(steps.size >= 2, "a sequence pattern needs at least two steps")
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val d = new SeqDetector(steps, withinMs)
    events.groupByKey(_.key)
      .flatMapGroupsWithState[(Int, Long, Long), SeqMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(d.process _)
  }

  final case class AbsenceAlert(key: String, firstTs: Timestamp,
      deadlineTs: Timestamp)

  /** Absence detection state = latest unanswered `first` timestamp. */
  private[streaming] final class AbsenceDetector(first: String, second: String,
      withinMs: Long) extends Serializable {
    private val withinUs = withinMs * 1000L

    def process(key: String, rows: Iterator[CepEvent],
        state: GroupState[Long]): Iterator[AbsenceAlert] = {
      def alert(aUs: Long) =
        AbsenceAlert(key, usTs(aUs), usTs(aUs + withinUs))
      if (state.hasTimedOut) {
        // watermark passed firstTs + withinMs with no answering `second`
        val a = state.get
        state.remove()
        Iterator.single(alert(a))
      } else {
        var pending = state.getOption.getOrElse(Long.MinValue)
        val out = Seq.newBuilder[AbsenceAlert]
        rows.toSeq.sortBy(ev => toUs(ev.ts)).foreach { ev =>
          val ts = toUs(ev.ts)
          // any event past the deadline proves the absence in-stream,
          // before the watermark timer would fire
          if (pending != Long.MinValue && ts > pending + withinUs) {
            out += alert(pending); pending = Long.MinValue
          }
          if (ev.etype == first) pending = ts // latest-wins, see scaladoc
          else if (ev.etype == second && pending != Long.MinValue &&
            ts > pending) pending = Long.MinValue // answered in time
        }
        if (pending == Long.MinValue) state.remove()
        else {
          state.update(pending)
          if (state.getCurrentWatermarkMs() >= 0)
            state.setTimeoutTimestamp(
              math.max(Math.floorDiv(pending, 1000L) + withinMs,
                state.getCurrentWatermarkMs() + 1))
        }
        out.result().iterator
      }
    }
  }

  /** Negative pattern: `first` NOT answered by `second` within `withinMs`
    * (cart abandonment, missed heartbeat). The alert fires either in-stream
    * (a later event proves the deadline passed) or from the event-time
    * timer once the watermark clears the deadline — the timer-EMISSION
    * path of the reference's watermark-callback machinery, not just
    * timer GC. A new `first` before the previous one's deadline replaces
    * it (latest-wins; the common monitoring semantics). */
  def detectAbsence(events: Dataset[CepEvent], first: String, second: String,
      withinMs: Long): Dataset[AbsenceAlert] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val d = new AbsenceDetector(first, second, withinMs)
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Long, AbsenceAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(d.process _)
  }
}
