package graft.operators

import graft.SparkTestBase

/** Delta-convergence PageRank — parity with the reference controller's
  * DELTA-threshold stop (PageRankController.scala:47-70), vs the fixed-tick
  * variant the driver oracles. */
class PageRankConvergenceSpec extends SparkTestBase {

  test("runUntilConverged stops at the fixed point and preserves rank mass") {
    import spark.implicits._
    val converged = PageRank.runUntilConverged(spark, sf, tol = 1e-6, maxIters = 40)
      .as[(Long, Double)].collect().toMap
    // probability mass is conserved: ranks sum to ~1
    assert(math.abs(converged.values.sum - 1.0) < 1e-3,
      s"rank mass ${converged.values.sum}")
    // a genuine fixed point: a tighter tolerance moves ranks by at most
    // ~tol/(1-damping) — the same answer to ~5 decimals
    val tighter = PageRank.runUntilConverged(spark, sf, tol = 1e-8, maxIters = 60)
      .as[(Long, Double)].collect().toMap
    assert(converged.keySet === tighter.keySet)
    val maxDiff = converged.map { case (k, v) => math.abs(v - tighter(k)) }.max
    // bound ~ tol * damping/(1-damping) with headroom (ranks are ~1e-3, so
    // 2e-4 still pins 2+ significant digits of every rank)
    assert(maxDiff < 2e-4, s"not a fixed point: maxDiff $maxDiff")
  }
}
