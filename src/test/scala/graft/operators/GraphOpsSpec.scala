package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Properties of the round-9 graph operators that the DuckDB oracle can't
  * express: the pointer-jumping convergence bound for connected components
  * and the DSIR importance-weight direction signal. */
class GraphOpsSpec extends SparkTestBase {

  test("components converges in O(log diameter) ticks on a long chain") {
    import spark.implicits._
    spark.catalog.clearCache()
    // a 256-node path: worst case for plain min-label propagation (255
    // ticks); pointer jumping must close it in ~log2(256)=8 ticks (+ a
    // couple of hook/settle rounds and the final no-change tick)
    val n = 256
    val chain = (0L until (n - 1L)).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, ticks) = GraphOps.componentsWithTicks(chain)
    val out = labels.as[(Long, Long)].collect()
    assert(out.length == n)
    assert(out.forall(_._2 == 0L), "every chain node must label to min node 0")
    assert(ticks <= 12, s"pointer jumping should need ~log2($n)=8 ticks, took $ticks")
  }

  test("components handles forests and singleton-free edge sets") {
    import spark.implicits._
    // two separate stars + one isolated edge
    val pairs = Seq((10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (20L, 22L), (30L, 31L)).toDF("a", "b")
    val got = GraphOps.components(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("dsir weights: target-language documents score higher than the rest") {
    import spark.implicits._
    val scored = Curation.dsirWeights.run(spark, sf)
      .join(graft.Tables.t(spark, sf, "documents").select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang") === "en", col("score_scaled").cast("double") / col("n_bigrams"))
      .as[(Boolean, Double)].collect()
    val en = scored.filter(_._1).map(_._2)
    val rest = scored.filter(!_._1).map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    val (enMean, restMean) = (en.sum / en.length, rest.sum / rest.length)
    // the hashed-bigram likelihood-ratio model must systematically prefer
    // its own target slice — that's the entire point of DSIR
    assert(enMean > restMean,
      s"en mean per-bigram log-ratio $enMean should exceed non-en $restMean")
    // and the per-doc means should separate by a clear margin, not noise
    // (measured ~0.054 nats/bigram at sf0.001; require at least 0.02)
    assert(enMean - restMean > 20000.0, // 1e6-scaled nats
      s"separation ${enMean - restMean} too small for a real signal")
  }
}
