package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input/output rows for streaming rate limiting. Top-level so the
  * generated encoders resolve accessors (the FfEvent constraint). */
final case class RlEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
final case class RlOut(event_id: Long, user_id: Long, day_start: java.sql.Timestamp)

/** STREAMING per-key rate limiting — the ingest-time counterpart of the
  * batch `ev_rate_limit` query: admit at most `maxPerDay` events per user
  * per event-time day, drop the rest, with the admission decision made the
  * moment the event's micro-batch is processed.
  *
  * Ordering contract (the ForwardFill discipline): per-key event-time order
  * ACROSS batches is assumed (the reference's per-connection FIFO delivery);
  * WITHIN a batch the group's events are sorted by (ts, event_id) before
  * folding, so any within-batch arrival shuffle is repaired.
  * StreamingRateLimitSpec pins equality with the batch query under
  * randomized order-preserving stream chopping.
  *
  * Scale: state per key is ONE (day_millis, count) pair — monotone
  * event-time means a new day RESETS the pair, so state never grows with
  * time or traffic; the quota check is O(1) per event. */
object RateLimit {
  private val DayMs = 86400000L

  def run(ds: Dataset[RlEvent], maxPerDay: Int): Dataset[RlOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Int), RlOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, it, state) =>
          var (day, cnt) = state.getOption.getOrElse((Long.MinValue, 0))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs) * DayMs
            if (d != day) { day = d; cnt = 0 }
            if (cnt < maxPerDay) {
              cnt += 1
              Some(RlOut(e.event_id, user, new java.sql.Timestamp(d)))
            } else None
          }
          state.update((day, cnt))
          out.iterator
      }
  }
}
