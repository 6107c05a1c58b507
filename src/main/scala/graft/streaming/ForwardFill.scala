package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input/output rows for the streaming forward fill. Top-level so the
  * generated encoders can resolve the accessors (same constraint as
  * MediaMeta — a nested case class silently falls back to the interpreted
  * encoder). */
final case class FfEvent(event_id: Long, user_id: Long,
    ts: java.sql.Timestamp, v: Option[Double])
final case class FfOut(event_id: Long, user_id: Long, filled: Option[Double])

/** STREAMING forward fill (LOCF) — the ingest-time counterpart of the batch
  * `ev_forward_fill` query: each key carries its last non-null reading as
  * managed state across micro-batches, and every event is emitted with the
  * gap-filled value the moment its batch is processed.
  *
  * Ordering contract: per-key event-time order ACROSS batches is assumed
  * (the reference's per-connection FIFO delivery, and what a key-partitioned
  * Kafka topic provides); WITHIN a micro-batch the group's events are
  * sorted by (ts, event_id) before folding, so any within-batch arrival
  * shuffle is repaired. StreamingForwardFillSpec pins equality with the
  * batch query under randomized order-preserving stream chopping.
  *
  * Scale: state per key is ONE double (the carry) — no buffering, no
  * per-event state growth; the sort is per-(key, batch) group, never a
  * global ordering. */
object ForwardFill {
  def run(ds: Dataset[FfEvent]): Dataset[FfOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Option[Double], FfOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, it, state) =>
          var carry: Option[Double] = state.getOption.getOrElse(None)
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val filled = e.v.orElse(carry)
            carry = filled
            FfOut(e.event_id, user, filled)
          }
          state.update(carry)
          out.iterator
      }
  }
}
