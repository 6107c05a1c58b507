package graft.api

import org.apache.spark.sql.DataFrame
import graft.operators.Curation

/** PUBLIC n-gram language-model scoring facade over arbitrary
  * (id, text) DataFrames — the library surface for the engine's
  * LM-based data-curation family (the registry's lm_* queries
  * demonstrate the same algorithms on the fixture corpus; this is what
  * a user scoring their own corpus calls). Column conventions are
  * positional (`toDF` renames), so any source schema works. Same code
  * as the registry queries (`Curation`'s helpers), re-exported with
  * public contracts.
  *
  * Scale shapes, shared by all four: the corpus is scanned at most
  * twice (model build + scoring) with the scans pruned to two columns;
  * the model's prefix totals are a window over MODEL rows (never a
  * second corpus pass); scoring is key-partitioned joins on the
  * bigram/unigram keys plus a tiny broadcast of the corpus scalars.
  * Every probability is integer-scaled before the per-document sum, so
  * results are independent of aggregation order.
  *
  * All scores are natural-log based and scaled to integer micro-nats
  * (`score_scaled` = Σ floor(ln p · 1e6 + 0.5)) — comparable across
  * documents and exactly reproducible. */
object LmScoring {

  private def docsShaped(df: DataFrame, arg: String): DataFrame = {
    require(df.columns.length == 2,
      s"expected a two-column (id, text) $arg frame, got ${df.columns.length} columns")
    df.toDF("doc_id", "text")
  }

  /** Self-scored bigram fluency: each document's mean bigram
    * probability under the model built from THIS corpus — the cheap
    * perplexity proxy used to rank web text (high avg_p = made of
    * common word transitions).
    * @param docs (id, text) — any column names
    * @return (doc_id, n_bigrams, sum_scaled, avg_p) ordered by doc_id;
    *         documents with fewer than 2 tokens are absent */
  def bigramScore(docs: DataFrame): DataFrame =
    Curation.lmBigramScoreOn(docsShaped(docs, "docs"))

  /** Stupid-backoff scoring (Brants et al. 2007) of `eval` under the
    * bigram model built on `train`: seen bigrams score ln(c_bg/c_w1);
    * unseen ones back off to 0.4 × the add-one unigram probability of
    * the continuation, so out-of-vocabulary text stays finite.
    * @param train (id, text) — the model corpus
    * @param eval  (id, text) — the documents to score
    * @return (doc_id, n_bigrams, n_backoff, score_scaled) by doc_id */
  def backoffScore(train: DataFrame, eval: DataFrame): DataFrame =
    Curation.lmBackoffScoreOn(docsShaped(train, "train"),
      docsShaped(eval, "eval"))

  /** Interpolated Kneser-Ney scoring (Chen & Goodman 1998 eq. 4.25) of
    * `eval` under the bigram model built on `train`: absolute discount
    * d = 0.75 on seen bigrams, the freed mass re-spent on the add-one-
    * smoothed CONTINUATION unigram — the proper-probability smoothing
    * that beats stupid backoff when scores must be comparable across
    * models.
    * @param train (id, text) — the model corpus
    * @param eval  (id, text) — the documents to score
    * @return (doc_id, n_bigrams, n_unseen, score_scaled) by doc_id */
  def kneserNeyScore(train: DataFrame, eval: DataFrame): DataFrame =
    Curation.lmKneserNeyOn(docsShaped(train, "train"),
      docsShaped(eval, "eval"))

  /** The perplexity-yield curve: documents ranked by self-scored
    * bigram fluency (best first) and bucketed into deciles, with the
    * document/token counts and the score floor of each — the
    * filter-tuning table that says what a quality cut COSTS in tokens.
    * The global rank is the two-phase distributed prefix sum, never a
    * single-task window. Ids must be integral, non-negative and < 2³⁶
    * (enforced with raise_error).
    * @param docs (id, text) — any column names
    * @return (decile, n_docs, n_tokens, score_floor) */
  def perplexityYield(docs: DataFrame): DataFrame = {
    val d = docsShaped(docs, "docs")
    Curation.perplexityYieldOn(d.sparkSession, d)
  }
}
