package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Rows for the online anomaly scorer (top-level for encoder codegen). */
final case class ZsOut(event_id: Long, user_id: Long, n_seen: Long,
    z: Option[Double], anomalous: Boolean)
final case class ZsState(n: Long, mean: Double, m2: Double)

/** ONLINE Z-SCORE ANOMALY SCORING with the semantics a stream actually
  * admits: each observation is scored against the running mean/variance of
  * everything BEFORE it on its own key (Welford's online moments — one
  * (n, mean, M2) triple per key), then folded in. This is deliberately NOT
  * the batch `ev_anomaly_zscore` reproduced online: that query pools stats
  * per event_type across the whole series, a population a stream can only
  * have in hindsight — the per-key prefix form is the standard online
  * detector (score against what this key has done so far). The flag
  * boundary (abs(z) >= Threshold, inclusive) matches the batch query's.
  *
  * A score needs n >= MinN prior observations (else z is None and nothing
  * flags) — the cold-start guard every online detector ships. Welford's
  * update is the numerically-stable recurrence, and because updates apply
  * in the per-key (ts, event_id) order, the emitted scores are BIT-EXACT
  * under any order-preserving chop (OnlineStatsSpec pins this against a
  * hand-rolled prefix reference).
  *
  * Same per-key ordering contract as [[ForwardFill]]; state per key is one
  * long + two doubles. */
object OnlineStats {
  val MinN = 5
  val Threshold = 3.0

  def zscores(ds: Dataset[FfEvent]): Dataset[ZsOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[ZsState, ZsOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, it, state) =>
          var s = state.getOption.getOrElse(ZsState(0L, 0.0, 0.0))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
            e.v.map { v =>
              val z =
                if (s.n >= MinN && s.m2 > 0.0)
                  Some((v - s.mean) / math.sqrt(s.m2 / s.n))
                else None
              // Welford fold AFTER scoring: the observation never sees itself
              val n1 = s.n + 1
              val d = v - s.mean
              val mean1 = s.mean + d / n1
              s = ZsState(n1, mean1, s.m2 + d * (v - mean1))
              ZsOut(e.event_id, user, n1, z,
                z.exists(x => math.abs(x) >= Threshold))
            }
          }
          state.update(s)
          out.iterator
      }
  }
}
