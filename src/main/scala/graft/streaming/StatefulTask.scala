package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** The same StatefulTask contract on Spark's state-v2 API
    * (`transformWithState`, Spark 4): keyed ValueState + EXPLICIT timers —
    * structurally the closest Spark surface to the reference's
    * CheckpointManager with named persistent states and watermark-scheduled
    * callbacks (reference: state/api/PersistentTask.scala:36-98; multi-state
    * handles via getValueState/getListState/getMapState mirror the
    * reference's per-task state registry). Requires the RocksDB state store
    * provider (a state-v2 constraint — and the 100 TB posture anyway). */
  def runV2[K: Encoder, IN, S: Encoder, OUT: Encoder](
      ds: Dataset[IN], keyFn: IN => K, task: StatefulTask[K, IN, S, OUT])(
      implicit kvEnc: Encoder[(K, IN)]): Dataset[OUT] = {
    val timeMode = if (task.timeoutMs > 0) TimeMode.EventTime() else TimeMode.None()
    ds.groupByKey(keyFn)
      .transformWithState(new TaskProcessor(task, implicitly[Encoder[S]]),
        timeMode, OutputMode.Append())
  }
}

/** StatefulProcessor adapter for [[StatefulTask]] — one named ValueState per
  * key plus a single rolling event-time timer reproducing the
  * flatMapGroupsWithState timeout semantics (each batch re-arms the timer at
  * watermark + timeoutMs; expiry emits `onExpire` and clears state). */
final class TaskProcessor[K, IN, S, OUT](
    task: StatefulTask[K, IN, S, OUT], sEnc: Encoder[S])
    extends StatefulProcessor[K, IN, OUT] {

  @transient private var state: ValueState[S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[S]("task_state", sEnc, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[IN],
      timers: TimerValues): Iterator[OUT] = {
    var s = if (state.exists()) state.get() else task.init
    val emitted = Seq.newBuilder[OUT]
    rows.foreach { in =>
      val (s2, out) = task.update(key, s, in)
      s = s2
      emitted ++= out
    }
    state.update(s)
    if (task.timeoutMs > 0) {
      // single rolling timeout: drop any previously armed timer for this key
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timers.getCurrentWatermarkInMs() + task.timeoutMs)
    }
    emitted.result().iterator
  }

  override def handleExpiredTimer(key: K, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[OUT] = {
    val out = task.onExpire(key, state.get())
    state.clear()
    out
  }
}
