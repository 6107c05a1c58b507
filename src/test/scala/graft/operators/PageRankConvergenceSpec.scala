package graft.operators

import graft.SparkTestBase

/** Delta-convergence PageRank — parity with the reference controller's
  * DELTA-threshold stop (PageRankController.scala:47-70), vs the fixed-tick
  * variant the driver oracles. */
class PageRankConvergenceSpec extends SparkTestBase {

  test("runUntilConverged stops at the fixed point and preserves rank mass") {
    import spark.implicits._
    val converged = PageRank.runUntilConverged(spark, sf, tol = 1e-7, maxIters = 60)
      .as[(Long, Double)].collect().toMap
    // probability mass is conserved: ranks sum to ~1
    assert(math.abs(converged.values.sum - 1.0) < 1e-3,
      s"rank mass ${converged.values.sum}")
    // a genuine fixed point: one more tick from it moves nothing — proxy:
    // a much tighter tolerance yields the same ranks to 6 dp
    val tighter = PageRank.runUntilConverged(spark, sf, tol = 1e-9, maxIters = 80)
      .as[(Long, Double)].collect().toMap
    assert(converged.keySet === tighter.keySet)
    val maxDiff = converged.map { case (k, v) => math.abs(v - tighter(k)) }.max
    assert(maxDiff < 1e-5, s"not a fixed point: maxDiff $maxDiff")
  }
}
