package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Similarity}

/** PUBLIC similarity-search facade over arbitrary embedding DataFrames —
  * the library surface for the engine's ANN/embedding family. Corpus and
  * query frames are two columns (id, embedding: Array[Float]), any names,
  * ANY dimension (the native `graft_cosine` expression is length-generic).
  * Scale shapes match the registry queries: query sets broadcast, scoring
  * is map-side, the corpus never shuffles; for billion-vector serving use
  * the registry's IVF/PQ/graph routes as blueprints. */
object SimilaritySearch {

  private def named(df: DataFrame, id: String, emb: String): DataFrame =
    df.toDF(id, emb)

  /** Exact cosine top-k per query (the correctness baseline every ANN
    * route is measured against). Scores round to 4 dp with id tie-breaks,
    * so ranking is deterministic at any parallelism.
    * @return (q_id, vec_id, cos_sim, rank) */
  def topK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int = 10): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val c = named(corpus, "vec_id", "embedding")
    val q = named(queries, "q_id", "q_emb")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        round(expr("graft_cosine(embedding, q_emb)"), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** MMR-diversified top-k (λ = 0.7): exact top-`shortlist` per query,
    * then the registry's greedy MMR selection — identical code to
    * ann_mmr_topk, so determinism guarantees carry over.
    * @return (q_id, pick, vec_id, rel, score), 5 picks per query */
  def mmrTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      shortlist: Int = 20): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val c = named(corpus, "vec_id", "embedding")
    val q = named(queries, "q_id", "q_emb")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rel").desc, col("vec_id"))
    val short = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), col("embedding"),
        round(expr("graft_cosine(embedding, q_emb)"), 4).as("rel"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= shortlist)
      .select(col("q_id"), col("vec_id"), col("embedding"), col("rel"))
    Similarity.mmrSelect(spark, short)
  }

  /** Distributed Lloyd k-means to a movement tolerance (deterministic
    * seeds = first k ids; packed-long argmax assignment, k×dim-sum
    * updates — the registry's emb_kmeans_* loop).
    * @return (centroids, iterations, per-iteration objective) */
  def kMeansTrain(spark: SparkSession, corpus: DataFrame, k: Int,
      maxIters: Int = 10, tol: Double = 1e-4): (Array[Array[Double]], Int, Seq[Double]) =
    KMeans.train(spark, named(corpus, "vec_id", "embedding"), k, maxIters, tol)

  /** TRAINED-CELL IVF top-k — the scale route [[topK]]'s exact scan is
    * traded against: train `nlist` k-means cells over the corpus
    * ([[kMeansTrain]]'s loop), invert the corpus into them once, then per
    * query score ONLY the `nprobe` nearest cells. Recall follows the
    * registry's ann_probe_sweep curve (more probes → higher recall, more
    * scanning); exactness is recovered at nprobe = nlist. 100 TB shape:
    * centroids broadcast (nlist ≤ 256 rows), cell assignment is one
    * map-side argmax, per-query scanning touches nprobe/nlist of the
    * corpus, and the only corpus-sized shuffle is the one cell-key join.
    * @return (q_id, vec_id, cos_sim, rank) top-k per query */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int = 10, nlist: Int = 8, nprobe: Int = 2,
      trainIters: Int = 5): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val c = named(corpus, "vec_id", "embedding")
    val q = named(queries, "q_id", "q_emb")
    val (cents, _, _) = KMeans.train(spark, c, nlist, trainIters)
    val inverted = KMeans.assignToCentroids(spark, c, cents)
      .select(col("vec_id"), col("embedding"), col("cluster"))
    // probe list: each query's nprobe nearest centroids (tiny frame —
    // queries × nlist rows ranked, queries × nprobe kept, broadcast to
    // the corpus-side join)
    val pw = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val probes = q.crossJoin(broadcast(KMeans.centroidFrame(spark, cents)))
      .select(col("q_id"), col("q_emb"), col("c_id"),
        round(expr("graft_cosine(q_emb, c_emb)"), 4).as("c_cos"))
      .withColumn("pn", row_number().over(pw)).filter(col("pn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("c_id").as("cluster"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    inverted.join(broadcast(probes), Seq("cluster"))
      .select(col("q_id"), col("vec_id"),
        round(expr("graft_cosine(embedding, q_emb)"), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs at cosine ≥ `minCosine` — the
    * ALL-PAIRS correctness baseline (O(n²): fine for verification slices;
    * at corpus scale use the registry's LSH-bucketed or SemDeDup-cluster
    * routes, which bound candidates before any cosine is computed).
    * @return (id_a, id_b, cos_sim) with id_a < id_b */
  def nearDupPairs(spark: SparkSession, corpus: DataFrame,
      minCosine: Double = 0.35): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val a = named(corpus, "id_a", "ea")
    val b = named(corpus, "id_b", "eb")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(expr("graft_cosine(ea, eb)"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }
}
