package graft.javaapi;

import java.util.function.Function;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.functions;

/**
 * Java mirror of {@link graft.api.Pipeline} — parity with the reference's
 * Java API surface (reference:
 * streaming/src/main/java/io/gearpump/streaming/javaapi/{Graph,Processor,
 * StreamApplication,Task}.java), which re-exposes the Scala graph builder to
 * Java users. Same disposition here: a thin Java-native fluent wrapper whose
 * stages are {@code java.util.function.Function<Dataset<Row>, Dataset<Row>>}
 * and whose edges are the Pipeline edge semantics (hash / shuffle /
 * broadcast / local) expressed directly on the Java Dataset API. Pure sugar:
 * zero execution code, the DAG is the Catalyst plan.
 *
 * <pre>{@code
 * Dataset<Row> out = JPipeline.from(df)
 *     .hash(32, "k")                       // HashPartitioner edge
 *     .stage(d -> d.groupBy("k").count())  // Processor
 *     .merge(JPipeline.from(other))        // fan-in
 *     .toDF();
 * }</pre>
 */
public final class JPipeline {
  private final Dataset<Row> df;
  private final Function<Dataset<Row>, Dataset<Row>> pendingEdge;

  private JPipeline(Dataset<Row> df, Function<Dataset<Row>, Dataset<Row>> pendingEdge) {
    this.df = df;
    this.pendingEdge = pendingEdge;
  }

  /** Source: any batch or streaming Dataset. */
  public static JPipeline from(Dataset<Row> df) {
    return new JPipeline(df, Function.identity());
  }

  /** HashPartitioner edge for the next stage (reference: partitioner/HashPartitioner.java parity). */
  public JPipeline hash(int n, String... keys) {
    Column[] cols = new Column[keys.length];
    for (int i = 0; i < keys.length; i++) cols[i] = functions.col(keys[i]);
    return new JPipeline(df, d -> d.repartition(n, cols));
  }

  /** ShufflePartitioner edge: round-robin redistribution. */
  public JPipeline shuffle(int n) {
    return new JPipeline(df, d -> d.repartition(n));
  }

  /** BroadcastPartitioner edge: mark the flowing relation broadcastable for its next join. */
  public JPipeline broadcastEdge() {
    return new JPipeline(df, functions::broadcast);
  }

  /** Wire the next named stage (Processor analog) through the pending edge. */
  public JPipeline stage(Function<Dataset<Row>, Dataset<Row>> f) {
    return new JPipeline(f.apply(pendingEdge.apply(df)), Function.identity());
  }

  /** Fan-in: union by name (the reference's multi-edge interleave). */
  public JPipeline merge(JPipeline other) {
    return new JPipeline(df.unionByName(other.df), Function.identity());
  }

  public Dataset<Row> toDF() {
    return df;
  }
}
