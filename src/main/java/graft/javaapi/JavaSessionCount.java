package graft.javaapi;

import java.sql.Timestamp;
import java.util.Collections;
import java.util.List;

/**
 * Java session-style accumulator: silent on update, emits the final count
 * only when the key's event-time timeout fires — the reference's
 * onWatermarkProgress-driven emission (reference:
 * streaming/src/main/scala/io/gearpump/streaming/task/Task.scala:160-166)
 * exercised through the Java API veneer. Covers the onExpireState and
 * timeoutMillis override points that {@link JavaRunningCount} leaves at
 * their defaults.
 */
public final class JavaSessionCount
    extends JavaStatefulTask<String, scala.Tuple2<String, Timestamp>, Long, scala.Tuple2<String, Long>> {

  @Override
  public Long initState() {
    return 0L;
  }

  @Override
  public Result<Long, scala.Tuple2<String, Long>> updateState(
      String key, Long state, scala.Tuple2<String, Timestamp> in) {
    return Result.of(state + 1L);
  }

  @Override
  public List<scala.Tuple2<String, Long>> onExpireState(String key, Long state) {
    return Collections.singletonList(new scala.Tuple2<>(key, state));
  }

  @Override
  public long timeoutMillis() {
    return 60000L;
  }
}
