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

  test("kcore peels chains off a triangle and cascades pendant removal") {
    import spark.implicits._
    // triangle 1-2-3 with a pendant chain 3-4-5: peeling at k=2 must remove
    // 5 first, THEN 4 (its degree only drops below 2 after 5 goes) — the
    // cascade that distinguishes iterative peeling from a one-shot degree
    // filter. Survivors: the triangle, every node at degree 2.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val (core, rounds) = GraphOps.kcore(pairs, 2)
    val got = core.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"2-core of triangle+chain must be the bare triangle, got $got")
    assert(rounds >= 3, s"pendant cascade takes 2 peel rounds + the no-change round, got $rounds")
    // one-shot degree filter would KEEP node 4 (degree 2 in the full graph)
    // — pin that the cascade actually removed it
    assert(!got.contains(4L))

    // k above the degeneracy empties the graph
    val (empty, _) = GraphOps.kcore(pairs, 3)
    assert(empty.isEmpty)

    // a clique survives any k below its size, degrees intact
    val clique = (for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)).toDF("a", "b")
    val (c4, _) = GraphOps.kcore(clique, 4)
    assert(c4.as[(Long, Long)].collect().toMap == (1L to 5L).map(_ -> 4L).toMap)
  }
}
