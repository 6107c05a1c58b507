package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input/output rows for the streaming funnel tracker. Top-level so the
  * generated encoders resolve accessors (the FfEvent constraint). */
final case class FunnelEvent(user_id: Long, us: Long, event_type: String)
final case class FunnelOut(user_id: Long, n_clicks: Long, n_purchases: Long,
    converted: Boolean)

/** STREAMING funnel / conversion tracker — the ingest-time counterpart of
  * the batch `ev_funnel` query: per user, maintain (first click time, last
  * purchase time, click count, purchase count) as events arrive and emit
  * the refreshed conversion verdict every micro-batch the user is touched
  * in. A user CONVERTS when some click precedes some purchase, which is
  * exactly first_click < last_purchase — the same min/max reduction the
  * batch query groups by, so the per-key state is FOUR longs forever and
  * every component is commutative and associative.
  *
  * Ordering contract: NONE — min/max/count are order-free, so the state is
  * invariant under any batch chopping AND any arrival order (the
  * SegmentTracker discipline, stronger than ForwardFill's per-key order).
  * A converted verdict is monotone: once true it can never flip back,
  * which is what makes the last-emitted row the serving truth.
  * StreamingFunnelSpec pins stream == batch under randomized chopping and
  * the sf0.001 trial against the registry ev_funnel rows. */
object FunnelTracker {
  def run(ds: Dataset[FunnelEvent]): Dataset[FunnelOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long, Long), FunnelOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, it, state) =>
          var (fc, lp, nc, np) =
            state.getOption.getOrElse((Long.MaxValue, Long.MinValue, 0L, 0L))
          it.foreach { e =>
            if (e.event_type == "click") { fc = math.min(fc, e.us); nc += 1 }
            else if (e.event_type == "purchase") { lp = math.max(lp, e.us); np += 1 }
          }
          state.update((fc, lp, nc, np))
          Iterator(FunnelOut(user, nc, np, fc < lp))
      }
  }
}
