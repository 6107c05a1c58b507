package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental embedding near-duplicate detection over a vector STREAM —
  * the embedding-space sibling of [[StreamingDedup]] (text MinHash), for
  * ingest-time semantic dedup of a training corpus: each arriving vector is
  * checked against previously-admitted vectors that share a random-
  * hyperplane LSH band, and flagged with the earlier vec_id it duplicates
  * (exact cosine verification, same threshold discipline as the batch
  * dedup_embedding_lsh query).
  *
  * Shape (scale notes):
  *  - the 16x2-bit band signatures are PER-ROW expressions
  *    (graft.operators.Similarity.lshBandedSig — deterministic md5-derived
  *    hyperplanes, shared with batch so the two paths cannot drift);
  *  - state is sharded by (band, bandHash) bucket key: lookups touch only
  *    the 16 buckets the new vector lands in, never the whole corpus, and
  *    bucket contents are the actual vectors for EXACT cosine verification
  *    (candidates from banding, decisions from arithmetic);
  *  - cross-batch memory is Spark's keyed state store (RocksDB-ready),
  *    checkpoint-recovered like the reference's PersistentTask state
  *    (reference: state/api/PersistentTask.scala:36-98).
  *
  * A vector in 16 buckets can match in several — consumers take any hit as
  * "is a duplicate" (distinct / min(dup_of) per vec_id downstream), exactly
  * like the text pipeline.
  */
object StreamingEmbeddingDedup {

  /** One row per (vector, band): (vec_id, embedding, b, bh) — THE batch
    * banding (16 bands x 2 hyperplane bits). */
  def banded(e: DataFrame): DataFrame =
    graft.operators.Similarity.lshBandedSig(e, bands = 16, rowsPerBand = 2)

  /** graft_cosine's exact arithmetic (same accumulation order, so the
    * streaming decision is bit-identical to the batch Expression's). */
  private[streaming] def cosine(x: Seq[Float], y: Seq[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark `round(_, 4)` (HALF_UP) — the batch query thresholds on the
    * ROUNDED similarity, so the stream must too. */
  private def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Match report: (vec_id, dup_of) for every band-bucket hit with rounded
    * cosine >= `minCosine` against an earlier vector. Novel vectors emit
    * nothing. Input must have (vec_id LONG, embedding ARRAY<FLOAT>). */
  def detect(spark: SparkSession, vectors: DataFrame,
      minCosine: Double = 0.35): Dataset[(Long, Long)] = {
    import spark.implicits._
    val b = banded(vectors)
      .select(concat_ws(":", col("b"), col("bh")).as("bucket"),
        col("vec_id"), col("embedding"))
      .as[(String, Long, Seq[Float])]
    b.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Seq[Float])], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long, Seq[Float])],
            state: GroupState[List[(Long, Seq[Float])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[(Long, Long)]
          // batch arrival order is nondeterministic; process by vec_id so
          // "earlier" is well-defined within a batch too
          rows.toSeq.sortBy(_._2).foreach { case (_, vecId, emb) =>
            // at-least-once replay re-delivers vec_ids: an already-seen
            // vector must neither re-emit nor bloat the state
            if (!seen.exists(_._1 == vecId)) {
              seen.foreach { case (seenId, seenEmb) =>
                if (round4(cosine(emb, seenEmb)) >= minCosine)
                  out += ((vecId, seenId))
              }
              seen = (vecId, emb) :: seen
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }
}
