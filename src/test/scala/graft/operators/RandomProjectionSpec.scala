package graft.operators

import graft.SparkTestBase

/** Semantic property behind emb_random_projection's oracle: a ±1 sign
  * matrix satisfies the Johnson-Lindenstrauss lemma (Achlioptas 2003), so
  * squared distances scaled by 1/k estimate original squared distances.
  * With k = 16 the per-pair estimator is noisy (std ≈ sqrt(2/k) ≈ 35%), so
  * the spec asserts the MEDIAN ratio over many pairs sits near 1 and every
  * ratio stays within a loose constant-distortion band — which is exactly
  * the guarantee downstream coarse clustering/ANN relies on. */
class RandomProjectionSpec extends SparkTestBase {

  test("projected squared distances / k track original squared distances") {
    // output is 16 flat scalar columns p00..p15 (r9: the driver comparator
    // can't sort array cells) — reassemble the projected vector per row
    val proj = Similarity.randomProjection.run(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(r.getDouble).toArray).toMap
    val orig = graft.Tables.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    val ids = orig.keys.toSeq.sorted
    val k = 16.0
    // deterministic pair sample: stride pairs across the sorted id list
    val ratios = (0 until 100).map { n =>
      val (a, b) = (ids(n % ids.size), ids((n * 37 + 11) % ids.size))
      (a, b)
    }.filter { case (a, b) => a != b }.map { case (a, b) =>
      val od = d2(orig(a), orig(b))
      val pd = d2(proj(a), proj(b)) / k
      pd / od
    }
    assert(ratios.nonEmpty)
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.size / 2)
    assert(median > 0.6 && median < 1.6, s"median distortion $median")
    assert(ratios.forall(r => r > 0.1 && r < 10.0),
      s"pair distortion escaped the constant band: ${ratios.filterNot(r => r > 0.1 && r < 10.0)}")
  }
}
