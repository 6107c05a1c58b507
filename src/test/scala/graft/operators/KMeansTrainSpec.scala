package graft.operators

import graft.SparkTestBase

/** Lloyd loop properties: the spherical-k-means objective (summed best
  * cosine) never decreases across iterations, the loop stops on the
  * movement tolerance, and centroids stay finite 64-d vectors. */
class KMeansTrainSpec extends SparkTestBase {

  test("objective is non-decreasing and the loop converges on the tolerance") {
    val e = graft.Tables.t(spark, sf, "embeddings")
    val (centroids, iters, objective) = KMeans.train(spark, e, k = 4,
      maxIters = 8, tol = 1e-3)
    assert(centroids.length === 4)
    assert(centroids.forall(c => c.length === 64 && c.forall(v => !v.isNaN)))
    assert(iters >= 1 && iters <= 8)
    assert(objective.nonEmpty)
    // monotone up to double-accumulation noise
    objective.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-6, s"objective dropped: $objective")
      case _ =>
    }
  }

  test("hierarchical coarse x fine training: more effective cells, monotone objective, total assignment") {
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.t(spark, sf, "embeddings")
    val (hier, iters, obj) = KMeans.trainHierarchical(spark, e,
      coarseK = 3, fineK = 3, maxIters = 6, tol = 1e-3)
    assert(hier.coarse.length === 3)
    // the whole point: effective cells exceed what one flat level of the
    // same width gives (3 coarse -> up to 9 posting lists)
    assert(hier.cells > 3 && hier.cells <= 9,
      s"coarse x fine must multiply cells: ${hier.cells}")
    assert(iters >= 1 && obj.nonEmpty)
    obj.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-6, s"fine objective dropped: $obj")
      case _ =>
    }
    // every corpus vector lands in exactly one trained (coarse, fine) cell
    val assigned = KMeans.assignToHier(spark,
      KMeans.assignToCentroids(spark,
          e.select(col("vec_id"), col("embedding")), hier.coarse)
        .select(col("vec_id"), col("embedding"), col("cluster")),
      hier.fine)
    assert(assigned.count() === e.count(), "hier assignment must be total")
    val keys = hier.fine.keySet
    assert(assigned.select(col("cluster"), col("f_id")).distinct().collect()
      .forall(r => keys.contains((r.getLong(0).toInt, r.getLong(1).toInt))),
      "every assigned cell must be a trained cell")
    // the radix guard is a named contract error, not silent corruption
    intercept[IllegalArgumentException] {
      KMeans.trainHierarchical(spark, e, coarseK = 2, fineK = 257)
    }
  }

  test("training from the converged centroids moves nothing") {
    val e = graft.Tables.t(spark, sf, "embeddings")
    val (_, _, obj1) = KMeans.train(spark, e, k = 4, maxIters = 12, tol = 1e-6)
    // a fixed point: one more full run from scratch reaches the same
    // objective plateau (same seeds, same data -> deterministic)
    val (_, _, obj2) = KMeans.train(spark, e, k = 4, maxIters = 12, tol = 1e-6)
    assert(obj1 === obj2, "training is deterministic for fixed seeds/data")
  }
}
