package graft.operators

import graft.SparkTestBase

/** Pins text_bpe_train's semantics against a plain-Scala reference BPE
  * trainer over the same corpus: greedy merge per round (count desc, then
  * lexicographic (a, b)), applied left-to-right non-overlapping — the
  * standard byte-pair-encoding training loop. Exact tuple equality, so a
  * drift in tokenization, weighting, tie-break, or merge application all
  * fail loudly (independently of the DuckDB oracle, which pins the same
  * thing through a completely different encoding — string replace over
  * delimited token strings). */
class BpeTrainSpec extends SparkTestBase {

  private def foldMerge(toks: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- toks) {
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
      else out += x
    }
    out.toVector
  }

  test("text_bpe_train equals the reference greedy trainer (10 merges, exact)") {
    val texts = graft.Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0)).toSeq

    val freq = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; w <- t.toLowerCase.split("[^a-z]+") if w.length >= 2)
      freq.update(w, freq.getOrElse(w, 0L) + 1L)
    var words: Seq[(Vector[String], Long)] =
      freq.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }

    val ref = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to 10) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, f) <- words; i <- 0 until toks.length - 1)
        pc.update((toks(i), toks(i + 1)), pc.getOrElse((toks(i), toks(i + 1)), 0L) + f)
      val ((a, b), c) = pc.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head
      ref += ((r, a, b, c))
      words = words.map { case (toks, f) => (foldMerge(toks, a, b), f) }
    }

    val got = TextAnalysis.bpeTrain.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === ref.result())
  }

  test("words that collapse to a single token stop contributing pairs (no crash, early exhaustion)") {
    // every word is 'ab': merge 1 = (a, b) collapses the whole vocabulary
    // to single tokens; round 2 must see zero pairs and stop — unguarded,
    // sequence(1, size(toks)-1) with size 1 is the descending [1, 0] and
    // element_at(toks, 0) throws
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_collapse").toString
    Seq((1L, "ab ab ab"), (2L, "ab ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.bpeTrain.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq((1, "a", "b", 5L)))
  }
}
