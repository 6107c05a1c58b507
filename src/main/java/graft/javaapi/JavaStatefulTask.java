package graft.javaapi;

import java.util.Collections;
import java.util.List;

import graft.streaming.StatefulTask;

/**
 * Java mirror of {@link graft.streaming.StatefulTask} — the analog of the
 * reference's javaapi Task veneer (reference:
 * streaming/src/main/java/io/gearpump/streaming/javaapi/Task.java, which
 * re-exposes the Scala Task contract with Java-friendly signatures).
 *
 * <p>Subclasses implement the same init / update / onExpire lifecycle as the
 * Scala contract but with Java collections in the signatures; this class
 * bridges them onto the Scala {@code (S, Iterator[OUT])} shapes, so a
 * JavaStatefulTask runs through the exact same
 * {@code StatefulTask.run / runV2} wiring (flatMapGroupsWithState /
 * transformWithState) as a Scala one — delivery semantics cannot differ.
 *
 * <pre>{@code
 * StatefulTask<String, Long, Long, String> counter =
 *     new JavaStatefulTask<String, Long, Long, String>() {
 *       public Long initState() { return 0L; }
 *       public Result<Long, String> updateState(String key, Long st, Long in) {
 *         long next = st + in;
 *         return Result.of(next, List.of(key + "=" + next));
 *       }
 *     };
 * }</pre>
 */
public abstract class JavaStatefulTask<K, IN, S, OUT> extends StatefulTask<K, IN, S, OUT> {

  /** New state + rows to emit, the Java face of {@code (S, Iterator[OUT])}. */
  public static final class Result<S, OUT> {
    public final S state;
    public final List<OUT> emit;

    private Result(S state, List<OUT> emit) {
      this.state = state;
      this.emit = emit;
    }

    public static <S, OUT> Result<S, OUT> of(S state, List<OUT> emit) {
      return new Result<>(state, emit);
    }

    public static <S, OUT> Result<S, OUT> of(S state) {
      return new Result<>(state, Collections.emptyList());
    }
  }

  /** Initial state for a new key. */
  public abstract S initState();

  /** Fold one input into state; optionally emit. */
  public abstract Result<S, OUT> updateState(K key, S state, IN in);

  /** Rows to emit when the key's event-time timeout fires (watermark
   *  passed; only called when {@link #timeoutMillis()} is positive). */
  public List<OUT> onExpireState(K key, S state) {
    return Collections.emptyList();
  }

  /** Event-time timeout horizon in ms beyond the current watermark;
   *  {@code <= 0} disables expiry. */
  public long timeoutMillis() {
    return 0L;
  }

  // ---- bridges onto the Scala contract (final: the Java surface above is
  // the override point) ----

  @Override
  public final S init() {
    return initState();
  }

  @Override
  public final scala.Tuple2<S, scala.collection.Iterator<OUT>> update(K key, S state, IN in) {
    Result<S, OUT> r = updateState(key, state, in);
    return new scala.Tuple2<>(r.state,
        scala.jdk.javaapi.CollectionConverters.asScala(r.emit.iterator()));
  }

  @Override
  public final scala.collection.Iterator<OUT> onExpire(K key, S state) {
    return scala.jdk.javaapi.CollectionConverters.asScala(onExpireState(key, state).iterator());
  }

  @Override
  public final long timeoutMs() {
    return timeoutMillis();
  }
}
