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

  test("training from the converged centroids moves nothing") {
    val e = graft.Tables.t(spark, sf, "embeddings")
    val (_, _, obj1) = KMeans.train(spark, e, k = 4, maxIters = 12, tol = 1e-6)
    // a fixed point: one more full run from scratch reaches the same
    // objective plateau (same seeds, same data -> deterministic)
    val (_, _, obj2) = KMeans.train(spark, e, k = 4, maxIters = 12, tol = 1e-6)
    assert(obj1 === obj2, "training is deterministic for fixed seeds/data")
  }
}
