package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Closed-form anchors for the ev_user_gini statistic — the planted
  * distributions whose Gini is known exactly, independent of the DuckDB
  * oracle (which only proves Spark==DuckDB, not that the formula measures
  * concentration). */
class GiniPropertySpec extends SparkTestBase {

  private def gini(pairs: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    EventOps.giniMicro(spark, pairs.toDF("user_id", "cnt"))
      .select(col("gini_micro")).as[Long].head()
  }

  test("uniform activity has Gini exactly 0") {
    assert(gini((1L to 100L).map(u => (u, 7L))) == 0L)
  }

  test("total concentration approaches (n-1)/n") {
    // 99 users with 1 event, one whale with 99901: G = exact formula value;
    // must be near 0.99 — and monotonically above a half-concentrated mix
    val whale = gini((1L to 99L).map(u => (u, 1L)) :+ (100L, 99901L))
    assert(whale > 980000L && whale < 1000000L, s"whale Gini $whale")
    val half = gini((1L to 50L).map(u => (u, 1L)) ++ (51L to 100L).map(u => (u, 99L)))
    assert(half > 0L && half < whale, s"half-mix $half must sit between 0 and $whale")
  }

  test("Gini is permutation-invariant in user ids") {
    val base = (1L to 40L).map(u => (u, u % 7 + 1))
    val shuffled = base.map { case (u, c) => (1000L - u, c) }
    assert(gini(base) == gini(shuffled))
  }

  test("pack overflow raises instead of silently mis-ranking") {
    val ex = intercept[Exception] { gini(Seq((1L, 1L << 31))) }
    assert(ex.getMessage != null)
  }
}
