package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental near-duplicate detection over a document STREAM — the
  * streaming form of graft.operators.Dedup's MinHash+LSH batch pipeline,
  * for ingest-time dedup of a training corpus: each arriving document is
  * checked against every previously-seen document's signature and either
  * admitted as novel or flagged with the earlier doc it duplicates.
  *
  * Shape (scale notes):
  *  - the 16-component signature is a PER-ROW expression (array_min over
  *    transformed shingles) — no shuffle, no state, pure codegen;
  *  - LSH banding shards the seen-signature state across band-hash keys, so
  *    state per key is a handful of signatures and lookups touch only the
  *    8 buckets the new doc lands in (never the whole corpus);
  *  - cross-batch memory is Spark's keyed state store (RocksDB-ready),
  *    checkpointed exactly like the reference's PersistentTask state
  *    (reference: streaming/src/main/scala/io/gearpump/streaming/state/api/PersistentTask.scala:36-98).
  *
  * A doc in 8 buckets can match in several; consumers take any hit as "is a
  * duplicate" (the spec aggregates to min dup_of). Matching threshold is
  * the batch pipeline's: >= 8/16 signature components equal (est. J >= 0.5).
  */
object StreamingDedup {
  private def NumHashes = graft.operators.Dedup.NumHashes

  /** One row per (band, doc): (doc_id, sig, b, bh) — THE batch pipeline's
    * signature and banding arithmetic (graft.operators.Dedup.perRowSigFast /
    * bandedSig, the hash-once xxhash64 family), so batch and streaming
    * dedup can never drift apart. */
  def banded(docs: DataFrame): DataFrame =
    graft.operators.Dedup.bandedSig(
      graft.operators.Dedup.perRowSigFast(docs),
      graft.operators.Dedup.xxBand)

  /** Match report: (doc_id, dup_of) for every band-bucket hit against an
    * earlier document. Novel docs emit nothing; take min(dup_of) per doc_id
    * downstream. State: per-bucket list of (doc_id, sig). */
  def detect(spark: SparkSession, docs: DataFrame): Dataset[(Long, Long)] = {
    import spark.implicits._
    val b = banded(docs).select(col("bh"), col("doc_id"), col("sig"))
      .as[(Long, Long, Seq[Long])]
    b.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Seq[Long])], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Seq[Long])],
            state: GroupState[List[(Long, Seq[Long])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[(Long, Long)]
          // batch arrival order is nondeterministic; process by doc_id so
          // "earlier" is well-defined within a batch too
          rows.toSeq.sortBy(_._2).foreach { case (_, docId, sig) =>
            // at-least-once replay re-delivers doc_ids: an already-seen doc
            // must neither re-emit its matches nor bloat the state
            if (!seen.exists(_._1 == docId)) {
              seen.foreach { case (seenId, seenSig) =>
                val nEq = sig.iterator.zip(seenSig.iterator).count { case (x, y) => x == y }
                if (nEq >= NumHashes / 2) out += ((docId, seenId))
              }
              seen = (docId, sig) :: seen
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }
}
