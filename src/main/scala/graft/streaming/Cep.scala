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

  /** State = epoch-ms of the latest `first` event, or MinValue. */
  private final class Detector(first: String, second: String, withinMs: Long)
      extends Serializable {

    def process(key: String, rows: Iterator[CepEvent],
        state: GroupState[Long]): Iterator[PatternMatch] = {
      if (state.hasTimedOut) {
        // watermark passed lastFirst + withinMs: no future `second` can match
        state.remove()
        Iterator.empty
      } else {
        var lastFirst = state.getOption.getOrElse(Long.MinValue)
        val out = Seq.newBuilder[PatternMatch]
        rows.toSeq.sortBy(_.ts.getTime).foreach { ev =>
          if (ev.etype == first) lastFirst = math.max(lastFirst, ev.ts.getTime)
          else if (ev.etype == second && lastFirst != Long.MinValue) {
            val gap = ev.ts.getTime - lastFirst
            if (gap > 0 && gap <= withinMs)
              out += PatternMatch(key, new Timestamp(lastFirst), ev.ts, gap)
          }
        }
        if (lastFirst == Long.MinValue) state.remove()
        else {
          state.update(lastFirst)
          if (state.getCurrentWatermarkMs() >= 0)
            state.setTimeoutTimestamp(
              math.max(lastFirst + withinMs, state.getCurrentWatermarkMs() + 1))
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
}
