package graft.operators

import graft.SparkTestBase

/** The LSH-bucketed embedding near-dup has the brute-force variant as its
  * in-repo recall oracle: exact cosine verification makes precision 1.0 by
  * construction, so the only way the variants can differ is a qualifying
  * pair whose every band disagrees — measured zero times on this corpus
  * (see Similarity.embNearDupLsh scaladoc for the numbers at all SFs). */
class SimilaritySpec extends SparkTestBase {

  private def pairs(q: graft.GraftQuery): Set[(Long, Long, Double)] =
    q.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("LSH-bucketed near-dup finds exactly the brute-force pairs") {
    val brute = pairs(Similarity.embNearDup)
    assert(brute.nonEmpty, "corpus should contain qualifying pairs")
    assert(pairs(Similarity.embNearDupLsh) == brute,
      "16x2 banding must recall every qualifying pair on this corpus")
  }
}
