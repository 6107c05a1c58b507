package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Sampling}

/** PUBLIC corpus-pipeline facade over arbitrary document DataFrames — the
  * reproducibility and assembly surface of a training-data pipeline:
  * deterministic sampling/splitting, train-vs-benchmark decontamination,
  * sequence packing, shard assignment, and token-budget allocation (the
  * registry's pipeline_* and curation_* queries demonstrate the same
  * algorithms on the fixture corpus; this is what a user running their own
  * corpus calls).
  *
  * Determinism convention: sample/split membership is a pure function of
  * document CONTENT (first 8 hex chars of md5(text) as a 0..99 bucket), so
  * every engine, shard, and re-run selects exactly the same documents —
  * `df.sample()`'s seed-and-partitioning dependence is the thing this
  * family exists to avoid. Same code as the registry queries (`Sampling`/
  * `Curation`'s helpers), re-exported with public contracts. */
object CorpusPipeline {

  private def docs(df: DataFrame): DataFrame = {
    require(df.columns.length == 2,
      s"expected a two-column (id, text) frame, got ${df.columns.length} columns")
    df.toDF("doc_id", "text")
  }

  /** The packers' shared id contract: the prefix-sum pack key casts ids
    * to long, so a string id would die mid-job with a raw ANSI cast error
    * — name it up front, once, for every packer. */
  private def requireIntegralId(d: DataFrame, fn: String): Unit = {
    val idType = d.schema("doc_id").dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(idType),
      s"$fn needs an integral id column, got $idType")
  }

  /** Stable content-hash sample: keep documents whose 0..99 content bucket
    * is < `pct`. Every engine, shard, and re-run keeps the same rows.
    * @param pct percentage to keep, 0..100
    * @return (doc_id, bucket) of the kept documents */
  def hashSample(df: DataFrame, pct: Int = 10): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0, 100], got $pct")
    docs(df).select(col("doc_id"), Sampling.contentBucket.as("bucket"))
      .filter(col("bucket") < pct)
  }

  /** Stable 80/10/10 train/val/test split labels — the label is a pure
    * function of content, so no shard ever disagrees.
    * @return (doc_id, bucket, split) with split in {train, val, test} */
  def splitLabels(df: DataFrame): DataFrame =
    Sampling.splitLabelsOf(docs(df))

  /** Train-vs-benchmark decontamination: training documents sharing >=
    * `minShared` distinct 3-grams with any benchmark document — the
    * overlap check every LLM training run must pass. The benchmark n-gram
    * index must stay eval-set-sized: past 1M n-grams the call fails loudly
    * (assert-then-broadcast) instead of silently broadcasting a
    * corpus-sized side.
    * @param train     (id, text) training corpus
    * @param benchmark (id, text) held-out eval set
    * @return (train_doc, bench_doc, n_shared) overlap pairs */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
      minShared: Int = 2): DataFrame =
    Curation.decontaminatePairs(
      docs(train),
      docs(benchmark).select(col("doc_id"), col("text")),
      minShared)

  /** Greedy-by-position sequence packing: assign documents to fixed
    * token-budget training sequences by the running whitespace-token count
    * in id order. The global running count is a TWO-PHASE distributed
    * prefix sum (range-bucket totals to the driver, per-bucket bases
    * broadcast back, partition-local windows) — no single-task window at
    * corpus scale.
    * @param budget tokens per packed sequence
    * @return (doc_id, n_tokens, seq_id, seq_offset) */
  def packSequences(df: DataFrame, budget: Int = 512): DataFrame = {
    val d = docs(df)
    requireIntegralId(d, "packSequences")
    Sampling.packByBudget(d.sparkSession, d, budget)
  }

  /** Per-segment attention/loss-mask manifest for packed sequences — the
    * companion of [[packSequences]] a causal-LM trainer actually consumes:
    * one row per (sequence, document SEGMENT), because a document whose
    * tokens straddle a budget boundary occupies a suffix of one sequence
    * and a prefix of the next. The trainer builds the block-diagonal
    * attention mask from exactly these rows (tokens may not attend across
    * document boundaries within a packed sequence) and the loss mask from
    * `is_head` (continuation segments' first-token loss is often dropped).
    * Tiling invariants: per sequence, segments abut ([0, budget) covered
    * without overlap except the final partial sequence); per document,
    * segment lengths sum to its token count with exactly one head.
    * Same two-phase distributed prefix sum as [[packSequences]]; the
    * explode is bounded at ⌈n_tokens/budget⌉ + 1 segments per document.
    * @param budget tokens per packed sequence
    * @return (seq_id, doc_id, seg_start, seg_len, is_head) */
  def packSpans(df: DataFrame, budget: Int = 512): DataFrame = {
    val d = docs(df)
    requireIntegralId(d, "packSpans")
    Sampling.packSpansOn(d.sparkSession, d, budget)
  }

  /** Deterministic shard assignment + within-shard shuffle order: shard =
    * content-hash of the id mod `nShards`, pos = rank by a reshuffle hash
    * within the shard — the manifest a distributed writer consumes.
    * @param ids any frame whose FIRST column is the document id
    * @return (doc_id, shard, pos) */
  def shardAssign(ids: DataFrame, nShards: Int = 16): DataFrame =
    Sampling.shardAssignOf(
      ids.select(ids.columns.head).toDF("doc_id"), nShards)

  /** Water-filling token-budget allocation across groups (sources, domains,
    * languages): allocate `budgetNum/budgetDen` of the total tokens by
    * raising a common water level — small groups keep everything, large
    * groups are capped equally (the standard mixture-rebalancing shape).
    * @param perGroup two-column (group, n_tokens) frame
    * @return (source, n_tokens, alloc_tokens, water_level, kept_frac) */
  def tokenBudget(perGroup: DataFrame,
      budgetNum: Long = 1, budgetDen: Long = 2): DataFrame = {
    require(perGroup.columns.length == 2,
      s"expected a two-column (group, n_tokens) frame, got ${perGroup.columns.length} columns")
    Curation.waterFillBudget(perGroup, budgetNum, budgetDen)
  }
}
