package graft.javaapi;

import java.util.Collections;

/**
 * Java wordcount-style running counter — the Java-API face of the reference's
 * wordcount `Sum` task (reference:
 * examples/streaming/wordcount-java/src/main/java/io/gearpump/streaming/
 * examples/wordcountjava/Sum.java), written against {@link JavaStatefulTask}
 * exactly as a library user would. Lives in main (not test) sources so javac
 * compiles the full user-facing surface on every build.
 */
public final class JavaRunningCount extends JavaStatefulTask<String, String, Long, scala.Tuple2<String, Long>> {

  @Override
  public Long initState() {
    return 0L;
  }

  @Override
  public Result<Long, scala.Tuple2<String, Long>> updateState(String key, Long state, String in) {
    long next = state + 1L;
    return Result.of(next, Collections.singletonList(new scala.Tuple2<>(key, next)));
  }
}
