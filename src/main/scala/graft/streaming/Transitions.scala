package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Rows for the streaming transition-hop emitter (top-level for encoder
  * codegen, same constraint as FfEvent). */
final case class TmEvent(event_id: Long, user_id: Long,
    ts: java.sql.Timestamp, event_type: String)
final case class TmHop(user_id: Long, from_type: String, to_type: String)

/** STREAMING state-transition emitter — the ingest-time counterpart of the
  * batch `ev_transition_matrix` query: each key carries only its LAST seen
  * event type as managed state and emits one (from, to) hop row per
  * consecutive event pair; any downstream count (batch or streaming agg)
  * yields the Markov transition matrix incrementally.
  *
  * Same ordering contract as [[ForwardFill]]: per-key event-time order
  * across batches (key-partitioned FIFO delivery); within a micro-batch
  * the group sorts by (ts, event_id). State per key is one string — no
  * buffering. StreamingTransitionSpec pins hop-set equality with the batch
  * lead() formulation under randomized order-preserving chopping. */
object Transitions {
  def hops(ds: Dataset[TmEvent]): Dataset[TmHop] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Option[String], TmHop](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, it, state) =>
          var prev: Option[String] = state.getOption.getOrElse(None)
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
            val hop = prev.map(p => TmHop(user, p, e.event_type))
            prev = Some(e.event_type)
            hop
          }
          state.update(prev)
          out.iterator
      }
  }
}
