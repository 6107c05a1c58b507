package graft.operators

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Semantic checks for registry queries that have no DuckDB oracle — each
  * rows-only entry gets a property assertion here so "no oracle" never means
  * "no check". (dedup_minhash_fast is covered by DedupSpec's cross-check
  * against the md5-oracled variant; part_* distribution properties by
  * their own smoke assertions.) */
class RowsOnlySemanticsSpec extends SparkTestBase {

  test("ev_cep_sequence: chains are ordered, window-bounded and non-overlapping per key") {
    // r17: this entry gained a recursive-CTE DuckDB oracle (no longer
    // rows-only); the invariants stay pinned here as a semantic backstop
    // the hash compare can't express.
    // the automaton's three invariants on the fixture corpus: every match
    // spans forward in time, fits the 24-hour window, and — greedy
    // non-overlapping restart — a key's next chain starts AT OR AFTER the
    // previous one ends (a completed chain resets the state, so no event
    // is shared between matches; a head event at exactly the previous
    // end's timestamp may legally open the next chain)
    val rows = SparkEntry.queries("ev_cep_sequence")(spark, sf)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime))
    assert(rows.nonEmpty, "the fixture log contains view->click->purchase chains")
    rows.foreach { case (k, s, e) =>
      assert(s < e, s"key $k: start must precede end")
      assert(e - s <= 86400000L, s"key $k: chain exceeds the 24-hour window")
    }
    rows.groupBy(_._1).foreach { case (k, ms) =>
      val sorted = ms.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b._2 >= a._3, s"key $k: chains overlap — ${a} then ${b}")
      }
    }
  }

  test("q27_approx_distinct: HLL estimate within 5% of exact per group") {
    // r18: the entry gained a bounded DuckDB oracle (exact side + verdict
    // column); this pin recomputes the estimate INDEPENDENTLY so the
    // query's within_5pct boolean is checked against the raw sketch
    // numbers, not against itself.
    val rows = SparkEntry.queries("q27_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_5pct")),
      "every group's estimate must sit inside the 5% envelope")
    val raw = graft.Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"group ${r.get(0)}: approx=$approx exact=$exact")
    }
  }

  test("ann_lsh_buckets: same-bucket pairs are more similar than random pairs") {
    import spark.implicits._
    val e = graft.Tables.t(spark, sf, "embeddings")
    // recompute the signature exactly as the query does, but keep vec_id->bucket
    val sig = SparkEntry.queries("ann_lsh_buckets")(spark, sf) // bucket histogram (smoke)
    assert(sig.count() > 1, "expected multiple buckets")

    // the production bucketing expression itself — not a copy that can drift
    val withBucket = Similarity.lshBucketed(e)
    val a = withBucket.select(col("vec_id").as("va"), col("embedding").as("ea"), col("bucket").as("ba"))
    val b = withBucket.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("bucket").as("bb"))
    val pairs = a.crossJoin(b).filter(col("va") < col("vb"))
      .select(Similarity.cosineFold("ea", "eb").as("cos"), (col("ba") === col("bb")).as("same"))
      .groupBy(col("same")).agg(avg(col("cos")).as("mean_cos"))
      .as[(Boolean, Double)].collect().toMap
    assert(pairs(true) > pairs(false) + 0.1,
      s"same-bucket mean cosine ${pairs(true)} should clearly exceed cross-bucket ${pairs(false)}")
  }

  test("mm_decode_features: deterministic across runs and plausible ranges") {
    val r1 = SparkEntry.queries("mm_decode_features")(spark, sf).collect()
    val r2 = SparkEntry.queries("mm_decode_features")(spark, sf).collect()
    assert(r1.sameElements(r2), "stubbed decode must be deterministic")
    r1.foreach { r =>
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("channels") == 3
        && r.getAs[Int]("n_frames") >= 1)
    }
  }

  test("text_winnow: fingerprint counts are a ~1/8 sample of shingles") {
    val fp = SparkEntry.queries("text_winnow")(spark, sf)
      .agg(sum(col("n_fingerprints"))).head().getLong(0)
    val shingleCount = graft.Tables.t(spark, sf, "documents")
      .select(size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 3)
      .agg(sum(col("n") - 2)).head().getLong(0)
    // winnowing with window 8 keeps roughly 2/(8+1) of positions; allow wide
    // slack but pin that it is a genuine sample: far below 100%, above 1%
    assert(fp > shingleCount / 100 && fp < shingleCount / 2,
      s"fingerprints=$fp shingles=$shingleCount")
  }
}
