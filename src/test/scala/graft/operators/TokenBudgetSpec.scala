package graft.operators

import graft.SparkTestBase

/** Hand-computed semantic pin for curation_token_budget (the oracle mirrors
  * the same closed form, so only an independent fixture catches a
  * formula-level mistake). Sources of 2/4/10 tokens, budget = 16 div 2 = 8:
  * sorted ascending, index 1 is non-binding (cand (8-0) div 3 = 2 = n), index
  * 2 binds (cand (8-2) div 2 = 3 < 4) -> water level 3, allocations 2/3/3 —
  * exactly the budget, and level 4 would overshoot (2+4+4 = 10 > 8). */
class TokenBudgetSpec extends SparkTestBase {

  test("waterfilling picks the maximal integer level under the budget") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("token_budget").toString
    Seq(
      (1L, "w w", "A", "en", 3L),
      (2L, "w w w w", "B", "en", 7L),
      (3L, "w w w w w w w w w w", "C", "en", 19L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Curation.tokenBudget.run(spark, dir)
      .select("source", "n_tokens", "alloc_tokens", "water_level", "kept_frac")
      .as[(String, Long, Long, Option[Long], Double)].collect().toList

    assert(got == List(
      ("A", 2L, 2L, Some(3L), 1.0),     // below the level: kept whole
      ("B", 4L, 3L, Some(3L), 0.75),    // the binding source: cut to 3
      ("C", 10L, 3L, Some(3L), 0.3)),   // above the level: cut to 3
      s"got $got")
    // the chosen level is maximal: total at L=3 is the full budget
    assert(got.map(_._3).sum == 8L)
  }
}
