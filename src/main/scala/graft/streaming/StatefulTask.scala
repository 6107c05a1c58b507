package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The stateful-operator recipe: the Spark-native replacement for the
  * reference's `PersistentTask` (framework-managed keyed state with
  * checkpoint-on-watermark,
  * reference: streaming/src/main/scala/io/gearpump/streaming/state/api/PersistentTask.scala:36-98)
  * and the raw `Task.onNext/onWatermarkProgress` pair
  * (reference: streaming/src/main/scala/io/gearpump/streaming/task/Task.scala:129-167).
  *
  * Mapping:
  *  - recover-at-start (PersistentTask.scala:65-73) -> state store restored
  *    from checkpointLocation automatically;
  *  - updateState per message (MonoidState.scala:40-47) -> `update`;
  *  - checkpoint when watermark passes (PersistentTask.scala:81-90) ->
  *    per-micro-batch state commit, no user code;
  *  - onWatermarkProgress emission (Task.scala:160-166) -> event-time
  *    timeout firing `onExpire`.
  */
abstract class StatefulTask[K, IN, S, OUT] extends Serializable {
  /** initial state for a new key (reference PersistentState.recover's
    * empty case, state/api/PersistentState.scala:26-40). */
  def init: S
  /** fold one input into state; optionally emit immediately. */
  def update(key: K, state: S, in: IN): (S, Iterator[OUT])
  /** called when the key's event-time timeout fires (watermark passed). */
  def onExpire(key: K, state: S): Iterator[OUT]
  /** event-time timeout horizon in ms beyond the max seen event time;
    * <=0 disables expiry. */
  def timeoutMs: Long = 0L

  final def process(key: K, inputs: Iterator[IN], state: GroupState[S]): Iterator[OUT] = {
    if (state.hasTimedOut) {
      val out = onExpire(key, state.get)
      state.remove()
      out
    } else {
      var s = state.getOption.getOrElse(init)
      val emitted = Seq.newBuilder[OUT]
      inputs.foreach { in =>
        val (s2, out) = update(key, s, in)
        s = s2
        emitted ++= out
      }
      state.update(s)
      if (timeoutMs > 0 && state.getCurrentWatermarkMs() >= 0)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeoutMs)
      emitted.result().iterator
    }
  }
}

object StatefulTask {
  /** Wire a StatefulTask over a keyed stream — the `flatMapGroupsWithState`
    * incantation with event-time timeout, matching PersistentTask's
    * watermark-driven lifecycle. The input stream must have a watermark
    * when used in streaming mode. */
  def run[K: Encoder, IN, S: Encoder, OUT: Encoder](
      ds: Dataset[IN], keyFn: IN => K, task: StatefulTask[K, IN, S, OUT])(
      implicit kvEnc: Encoder[(K, IN)]): Dataset[OUT] = {
    val timeout =
      if (task.timeoutMs > 0) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[S, OUT](OutputMode.Append(), timeout)(task.process _)
  }
}
