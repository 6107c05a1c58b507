package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Rows for the online change detector (top-level for encoder codegen).
  * `ts` (appended r17 — existing positional readers keep indexes 0-4) is
  * the triggering observation's event time, so an alarm can feed an
  * alert pager without a join back to the log. */
final case class PhOut(event_id: Long, user_id: Long, n_seen: Long,
    ph: Double, alarm: Boolean, ts: java.sql.Timestamp)
final case class PhState(n: Long, mean: Double, m: Double, mMin: Double)

/** PAGE-HINKLEY ONLINE CHANGE DETECTION — the ingest-time counterpart of
  * the batch `ev_changepoint` CUSUM locator, with the semantics a stream
  * admits: the batch query sees the whole series and places the single
  * best split; the online form maintains, per key, the cumulative
  * deviation m_t = sum(v_i - mean_i - delta) against its running minimum
  * and raises an alarm when the gap PH_t = m_t - min(m) exceeds lambda —
  * the classic sequential drift test (Page 1954; the standard stream-mining
  * formulation). The running mean is Welford's, updated BEFORE the
  * deviation fold so each observation compares against a mean that
  * includes it (the textbook recurrence).
  *
  * Updates apply in per-key (ts, event_id) order, so emissions are
  * BIT-EXACT under any order-preserving chop (PageHinkleySpec pins this
  * against a hand-rolled prefix reference). State per key: one long +
  * three doubles. Alarms are emitted but state is NOT reset — downstream
  * decides the reaction policy (reset-on-alarm is a one-line variant). */
object PageHinkley {
  val Delta = 0.005
  val Lambda = 50.0

  /** The per-group state fold, extracted (the Cep.Detector pattern) so
    * DetectorPropertySpec can drive it through Spark's public
    * TestGroupState — hundreds of ScalaCheck-random streams checked for
    * batch-boundary invariance in milliseconds, no streaming queries. */
  final class Detector(delta: Double, lambda: Double) extends Serializable {
    def process(user: Long, it: Iterator[FfEvent],
        state: org.apache.spark.sql.streaming.GroupState[PhState]): Iterator[PhOut] = {
      var s = state.getOption.getOrElse(PhState(0L, 0.0, 0.0, 0.0))
      val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
        e.v.map { v =>
          val n1 = s.n + 1
          val mean1 = s.mean + (v - s.mean) / n1
          val m1 = s.m + (v - mean1 - delta)
          val mMin1 = math.min(s.mMin, m1)
          s = PhState(n1, mean1, m1, mMin1)
          val ph = m1 - mMin1
          PhOut(e.event_id, user, n1, ph, ph > lambda, e.ts)
        }
      }
      state.update(s)
      out.iterator
    }
  }

  /** `delta`/`lambda` default to the fixture-calibrated constants; the
    * public facade ([[graft.api.EventAnalytics.pageHinkley]]) passes the
    * caller's own drift allowance and alarm threshold. Runs identically
    * over a stream (state carried across micro-batches) and a bounded
    * batch frame (one flatMapGroupsWithState pass, empty initial state). */
  def detect(ds: Dataset[FfEvent], delta: Double = Delta,
      lambda: Double = Lambda): Dataset[PhOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[PhState, PhOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        new Detector(delta, lambda).process)
  }
}
