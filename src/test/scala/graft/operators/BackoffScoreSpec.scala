package graft.operators

import graft.SparkTestBase

/** Hand-computed semantic pin for lm_backoff_score. Train doc (id 1):
  * "a b a b" -> c(a b)=2, prefix c(a .)=2, unigrams a:2 b:2, T=4, V=2.
  * Eval doc (id 0, the %5 slice) is "a b" plus the planted token "zq0":
  * bigram (a b) is seen -> ln(2/2) = 0; (b zq0) backs off with OOV w2 ->
  * ln(0.4 * (0+1)/(4+2)) = ln(1/15) = -2.7080502011...; scaled
  * floor(-2708050.2011 + 0.5) = -2708050. */
class BackoffScoreSpec extends SparkTestBase {

  test("seen bigrams score ln(c2/c1); unseen back off to the 0.4 add-one unigram") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("backoff").toString
    Seq(
      (0L, "a b", "A", "en", 3L),   // eval slice (0 % 5 == 0)
      (1L, "a b a b", "A", "en", 7L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Curation.lmBackoffScore.run(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((0L, 2L, 1L, -2708050L)), s"got $got")
  }
}
