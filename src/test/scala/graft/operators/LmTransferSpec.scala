package graft.operators

import graft.SparkTestBase

/** The transfer matrix's reason to exist: every language's held-out slice
  * must score strictly best under its OWN model (per-bigram mean, computed
  * client-side because score_scaled is negative and cross-engine integer
  * division on negatives diverges — the scaladoc's documented convention). */
class LmTransferSpec extends SparkTestBase {

  test("diagonal dominance: each eval_lang scores best under its own model") {
    val rows = Curation.lmTransferMatrix.run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(4).toDouble / r.getLong(2))
      .toMap
    val langs = rows.keys.map(_._2).toSet
    assert(langs.size >= 3, s"expected a multi-language corpus, got $langs")
    for (ev <- langs) {
      val own = rows((ev, ev))
      for (m <- langs if m != ev)
        assert(own > rows((m, ev)),
          s"eval=$ev should score better under its own model ($own) " +
            s"than under $m (${rows((m, ev))})")
    }
  }
}
