package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The reason-to-exist of the round-12 retrieval operators, measured (the
  * salted-join payoff precedent): MMR's picks must actually be more
  * diverse than the plain top-k it replaces, and post-filter recall must
  * be monotone in the over-fetch knob it exists to tune. */
class RetrievalPayoffSpec extends SparkTestBase {

  test("ann_mmr_topk picks are more diverse than the plain top-5") {
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def avgPairwise(sets: Map[Long, Seq[Long]]): Double = {
      val vals = for {
        (_, ids) <- sets.toSeq
        i <- ids.indices; j <- (i + 1) until ids.size
      } yield cos(emb(ids(i)), emb(ids(j)))
      vals.sum / vals.size
    }
    val mmr = graft.SparkEntry.queries("ann_mmr_topk")(spark, sf)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    val plain = graft.SparkEntry.queries("ann_cosine_topk")(spark, sf)
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    assert(mmr.keySet == plain.keySet && mmr.values.forall(_.size == 5))
    val (dMmr, dPlain) = (avgPairwise(mmr), avgPairwise(plain))
    info(f"avg within-set pairwise cosine: mmr=$dMmr%.4f plain=$dPlain%.4f")
    assert(dMmr < dPlain,
      f"MMR must reduce within-set similarity ($dMmr%.4f vs plain $dPlain%.4f)")
  }

  test("ann_filtered_recall: post-filter recall is monotone in over-fetch") {
    val rows = graft.SparkEntry.queries("ann_filtered_recall")(spark, sf)
      .select(col("q_id"), col("overfetch"), col("n_hit")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val qs = rows.keys.map(_._1).toSet
    // a (q, F) cell with zero predicate survivors inside the global top-F
    // legitimately has no output row — it contributes 0 hits
    def hit(q: Long, f: Int): Long = rows.getOrElse((q, f), 0L)
    for (q <- qs) {
      assert(hit(q, 10) <= hit(q, 20) && hit(q, 20) <= hit(q, 40),
        s"recall must be monotone in F for q=$q: " +
          s"${hit(q, 10)}/${hit(q, 20)}/${hit(q, 40)}")
    }
    // and the knob must actually move somewhere on this corpus
    assert(qs.exists(q => hit(q, 40) > hit(q, 10)),
      "over-fetch should improve recall for at least one query")
  }
}
