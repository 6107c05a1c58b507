package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL handles for Spark's OWN Bloom-filter expressions.
  *
  * Spark ships a production Bloom filter pair — `BloomFilterAggregate`
  * (a TypedImperativeAggregate with map-side partials whose buffers MERGE,
  * so building the filter is one normal aggregation over the corpus) and
  * `BloomFilterMightContain` (a codegen'd membership predicate) — but only
  * wires them into the optimizer's runtime row-level filtering; neither is
  * exposed in the public FunctionRegistry (probed: UNRESOLVED_ROUTINE on
  * 4.1.2). These are exactly the right primitives for an explicit
  * broadcast-Bloom ingest gate (dedup_ingest_delta_bloom), and a native
  * Expression beats any UDF re-implementation (build-rules preference
  * order), so we register them under graft_ names — same idempotent
  * pattern as [[VectorFunctions.ensureRegistered]].
  *
  * Contracts inherited from the internals: the value side must be a LONG
  * (hash with xxhash64 first); the filter side of graft_might_contain must
  * be a constant or a scalar subquery (the analyzer rejects arbitrary
  * attributes), which is what makes the physical plan a build-once,
  * share-everywhere filter rather than a join.
  */
object BloomFunctions {
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def registerIfAbsent(name: String, builder: Seq[Expression] => Expression): Unit = {
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    registerIfAbsent("graft_bloom_agg", {
      case Seq(child) => new BloomFilterAggregate(child)
      case Seq(child, est) => new BloomFilterAggregate(child, est)
      case Seq(child, est, bits) => new BloomFilterAggregate(child, est, bits)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg expects 1-3 args, got ${other.size}")
    })
    registerIfAbsent("graft_might_contain", {
      case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
      case other => throw new IllegalArgumentException(
        s"graft_might_contain expects 2 args, got ${other.size}")
    })
  }
}
