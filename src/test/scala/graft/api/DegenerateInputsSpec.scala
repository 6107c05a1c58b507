package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The public facades accept arbitrary user frames — pin what each does on
  * the degenerate shapes a user will eventually feed them: empty inputs,
  * single nodes, self-loops, duplicate edges, zero-width embeddings,
  * all-equal texts. Contract violations must fail loudly with named
  * requirements; everything else must return a well-formed (usually
  * empty) result, never throw from deep inside a plan. */
class DegenerateInputsSpec extends SparkTestBase {

  private def edges(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("u", "v")
  }

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  private def vecs(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "emb")
  }

  // ------------------------------------------------------------------
  // GraphAlgorithms
  // ------------------------------------------------------------------

  test("graph: empty edge list yields empty results, not errors") {
    val e = edges(Seq.empty)
    assert(GraphAlgorithms.connectedComponents(e).count() == 0)
    assert(GraphAlgorithms.kCore(e, 2).count() == 0)
    assert(GraphAlgorithms.commonNeighbors(e).count() == 0)
  }

  test("graph: single node via self-loop; self-loops don't corrupt components") {
    val cc = GraphAlgorithms.connectedComponents(edges(Seq((1L, 1L))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.toSeq == Seq((1L, 1L)), s"${cc.toSeq}")
    // a self-loop on a real component must not change its labeling
    val base = GraphAlgorithms.connectedComponents(edges(Seq((1L, 2L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val looped = GraphAlgorithms.connectedComponents(
      edges(Seq((1L, 2L), (2L, 2L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(base.sameElements(looped), s"${base.toSeq} vs ${looped.toSeq}")
  }

  test("graph: duplicate edges don't inflate common-neighbor counts") {
    // wedge 1-2, 1-3 => pair (2,3) has exactly 1 common neighbor
    val clean = edges(Seq((1L, 2L), (1L, 3L)))
    val dup = edges(Seq((1L, 2L), (1L, 2L), (1L, 3L), (1L, 3L), (1L, 3L)))
    def pairs(df: DataFrame) = GraphAlgorithms.commonNeighbors(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(pairs(clean).sameElements(pairs(dup)),
      s"${pairs(clean).toSeq} vs ${pairs(dup).toSeq}")
  }

  test("graph: named requirements fail loudly on contract violations") {
    val e = edges(Seq((1L, 2L)))
    intercept[IllegalArgumentException] { GraphAlgorithms.kCore(e, 0) }
    intercept[IllegalArgumentException] { GraphAlgorithms.commonNeighbors(e, hubCap = 0) }
    intercept[IllegalArgumentException] { GraphAlgorithms.louvain(edges(Seq.empty).toDF("u", "v")) }
  }

  // ------------------------------------------------------------------
  // DedupAlgorithms
  // ------------------------------------------------------------------

  test("dedup: empty corpus yields empty results everywhere") {
    val e = docs(Seq.empty)
    assert(DedupAlgorithms.exactDuplicates(e).count() == 0)
    assert(DedupAlgorithms.nearDupPairs(e).count() == 0)
    assert(DedupAlgorithms.nearDupClusters(e).count() == 0)
    assert(DedupAlgorithms.ingestDelta(e, e).count() == 0)
  }

  test("dedup: all-equal texts collapse to one keeper / one full cluster") {
    val same = docs((1L to 5L).map(i => (i, "alpha beta gamma delta epsilon")))
    val ex = DedupAlgorithms.exactDuplicates(same).collect()
    assert(ex.length == 1 && ex.head.getLong(0) == 1L && ex.head.getLong(2) == 5L)
    // identical docs near-dup pairwise: C(5,2) pairs, all 16/16 agreement
    val pairs = DedupAlgorithms.nearDupPairs(same).collect()
    assert(pairs.length == 10 && pairs.forall(_.getInt(2) == 16), s"${pairs.toSeq}")
    val cl = DedupAlgorithms.nearDupClusters(same).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cl.length == 5 && cl.forall(_._2 == 1L), s"${cl.toSeq}")
  }

  test("dedup: documents under 3 words never pair (documented contract)") {
    val tiny = docs(Seq((1L, "one two"), (2L, "one two"), (3L, "x")))
    assert(DedupAlgorithms.nearDupPairs(tiny).count() == 0)
    // but exact dedup still collapses them
    assert(DedupAlgorithms.exactDuplicates(tiny).count() == 2)
  }

  test("dedup/similarity: exact-pair facades refuse >guard-row corpora unless exact = true") {
    // the O(n²)/exact-verify baselines throw a NAMED contract error above
    // ExactPairsGuardRows — a skimmed signature must not be able to fire
    // an all-pairs cross join on a billion-row frame
    val big = spark.range(SimilaritySearch.ExactPairsGuardRows + 1)
      .select(col("id"), concat(lit("doc text "), col("id")).as("text"))
    val eJac = intercept[IllegalArgumentException] {
      DedupAlgorithms.jaccardPairs(big)
    }
    assert(eJac.getMessage.contains("jaccardPairs") &&
      eJac.getMessage.contains("exact = true"), eJac.getMessage)
    val eCont = intercept[IllegalArgumentException] {
      DedupAlgorithms.containmentPairs(big)
    }
    assert(eCont.getMessage.contains("containmentPairs"), eCont.getMessage)
    val bigVec = spark.range(SimilaritySearch.ExactPairsGuardRows + 1)
      .select(col("id"), array(lit(1f), lit(0f)).as("emb"))
    val eNd = intercept[IllegalArgumentException] {
      SimilaritySearch.nearDupPairs(spark, bigVec)
    }
    assert(eNd.getMessage.contains("nearDupPairs") &&
      eNd.getMessage.contains("exact = true"), eNd.getMessage)
    // exact = true acknowledges the cost: plan construction succeeds (we
    // don't execute the quadratic plan here — the guard is the subject)
    SimilaritySearch.nearDupPairs(spark, bigVec, exact = true)
    // and jaccardPairs with exact = true runs end-to-end on the big frame
    // (its candidate path is df-capped, so this is cheap): unique texts
    // share no shingles => zero pairs, proving small-corpus semantics are
    // untouched by the knob
    assert(DedupAlgorithms.jaccardPairs(
      big.limit(200), exact = true).count() == 0)
  }

  // ------------------------------------------------------------------
  // SimilaritySearch
  // ------------------------------------------------------------------

  test("similarity: empty corpus / empty query set yield empty top-k") {
    val e = vecs(Seq.empty)
    val q = vecs(Seq((0L, Seq(1f, 0f))))
    assert(SimilaritySearch.topK(spark, e, q).count() == 0)
    assert(SimilaritySearch.topK(spark, vecs(Seq((1L, Seq(1f, 0f)))), e).count() == 0)
    assert(SimilaritySearch.nearDupPairs(spark, e).count() == 0)
  }

  test("similarity: zero-width embeddings score NaN and are pinned, not crashes") {
    // 0.0/0.0 inside graft_cosine: NaN, which Spark sorts ABOVE any real
    // similarity in the descending rank — documented sharp edge, pinned
    // here so a behavior change is caught
    val corpus = vecs(Seq((1L, Seq.empty[Float]), (2L, Seq(1f, 0f))))
    val q = vecs(Seq((9L, Seq(1f, 0f))))
    val rows = SimilaritySearch.topK(spark, corpus, q, k = 2)
      .orderBy(col("rank")).collect()
    assert(rows.length == 2)
    assert(rows.head.getLong(1) == 1L && rows.head.getDouble(2).isNaN,
      s"NaN ranks first: ${rows.toSeq}")
    assert(rows(1).getLong(1) == 2L && rows(1).getDouble(2) == 1.0)
  }

  test("similarity: ivfTopK contracts — empty queries empty out; nprobe >= nlist is exact") {
    val corpus = vecs(Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 0.1f))))
    val noQ = vecs(Seq.empty)
    assert(SimilaritySearch.ivfTopK(spark, corpus, noQ, nlist = 2).count() == 0)
    // nprobe past nlist clamps harmlessly (every cell already scanned)
    val q = vecs(Seq((9L, Seq(1f, 0f))))
    val all = SimilaritySearch.ivfTopK(spark, corpus, q, k = 3, nlist = 2, nprobe = 99)
    val exact = SimilaritySearch.topK(spark, corpus, q, k = 3)
    assert(all.select("q_id", "vec_id", "rank").collect().toSet
      === exact.select("q_id", "vec_id", "rank").collect().toSet)
  }

  test("similarity: kMeansTrain contracts — k bounds named, k > n degrades to n seeds") {
    val corpus = vecs(Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))))
    intercept[IllegalArgumentException] {
      SimilaritySearch.kMeansTrain(spark, corpus, k = 0)
    }
    intercept[IllegalArgumentException] {
      SimilaritySearch.kMeansTrain(spark, corpus, k = 300)
    }
    val (cents, _, _) = SimilaritySearch.kMeansTrain(spark, corpus, k = 5)
    assert(cents.length == 2, s"k > n seeds degrade to n, got ${cents.length}")
    // an empty corpus names its contract instead of crashing with
    // `empty.max` deep inside the movement check (this also guards
    // graphAnnBuild, whose first step is this training loop)
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.kMeansTrain(spark, vecs(Seq.empty), k = 2)
    }
    assert(e.getMessage.contains("non-empty corpus"), e.getMessage)
  }

  // ------------------------------------------------------------------
  // TextAnalytics / CorpusPipeline
  // ------------------------------------------------------------------

  test("text: empty corpus and empty strings are well-formed, never div-by-zero") {
    val e = docs(Seq.empty)
    assert(TextAnalytics.qualityScores(e).count() == 0)
    assert(TextAnalytics.bpeTrain(e).count() == 0)
    assert(TextAnalytics.bpeTokenCounts(e).count() == 0)
    // "" splits to one empty token: n_tokens = 1, ratios defined
    val blank = TextAnalytics.qualityScores(docs(Seq((1L, "")))).collect().head
    assert(blank.getAs[Int]("n_tokens") == 1 && blank.getAs[Double]("ttr") == 1.0)
    // a corpus with no >= 2-char alphabetic words trains zero merges
    assert(TextAnalytics.bpeTrain(docs(Seq((1L, "a 1 2 b")))).count() == 0)
    assert(TextAnalytics.chunk(docs(Seq((1L, "")))).count() == 1)
  }

  test("text: all-equal texts — quality/langid/chunks are per-row stable") {
    val same = docs((1L to 4L).map(i => (i, "the cat sat")))
    val q = TextAnalytics.qualityScores(same).collect()
    assert(q.length == 4 && q.map(_.getAs[Double]("score")).distinct.length == 1)
    assert(TextAnalytics.languageId(same).collect()
      .forall(_.getString(1) == "en"))
  }

  test("multimodal planner: empty and zero-byte metadata degrade gracefully") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "b")
    assert(MultimodalPlanner.shardManifest(empty).count() == 0)
    assert(MultimodalPlanner.audioWindows(empty).count() == 0)
    assert(MultimodalPlanner.patchGrid(
      Seq.empty[(Long, Int, Int)].toDF("id", "w", "h")).count() == 0)
    // a zero-byte payload still yields its one (empty) window row — no
    // sample silently dropped, the documented contract
    val z = MultimodalPlanner.audioWindows(Seq((1L, 0L)).toDF("id", "b"),
      windowSamples = 4, hopSamples = 2, bytesPerSample = 1).collect()
    assert(z.length == 1 && z.head.getLong(3) == 0L, s"${z.toSeq}")
    intercept[IllegalArgumentException] {
      MultimodalPlanner.audioWindows(empty, windowSamples = 0)
    }
    intercept[IllegalArgumentException] {
      MultimodalPlanner.patchGrid(
        Seq((1L, 10, 10)).toDF("id", "w", "h"), patch = 0)
    }
  }

  test("pipeline: empty corpus flows through every stage; zero-token groups don't divide by zero") {
    val e = docs(Seq.empty)
    assert(CorpusPipeline.hashSample(e, 50).count() == 0)
    assert(CorpusPipeline.splitLabels(e).count() == 0)
    assert(CorpusPipeline.packSequences(e).count() == 0)
    assert(CorpusPipeline.shardAssign(e).count() == 0)
    assert(CorpusPipeline.decontaminate(e, e).count() == 0)
    import spark.implicits._
    // a zero-token group: kept_frac nulls out instead of ANSI-throwing
    val g = Seq(("a", 0L), ("b", 10L)).toDF("src", "n")
    val rows = CorpusPipeline.tokenBudget(g).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(rows("a").isEmpty && rows("b").nonEmpty, s"$rows")
  }
}
