package graft.streaming

import graft.SparkTestBase

/** Streaming embedding near-dup must equal the batch ground truth: every
  * qualifying pair (rounded cosine >= 0.35) is reported exactly as
  * (later vec_id, earlier vec_id) regardless of how the stream is chopped
  * into micro-batches — banding is recall-complete on this corpus (the
  * property SimilaritySpec pins for the batch path). */
class StreamingEmbeddingDedupSpec extends SparkTestBase {

  private def corpus(): Seq[(Long, Seq[Float])] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      .sortBy(_._1)
      .toSeq
  }

  private def bruteForcePairs(vs: Seq[(Long, Seq[Float])]): Set[(Long, Long)] = {
    val arr = vs.toArray
    val out = Set.newBuilder[(Long, Long)]
    for (i <- arr.indices; j <- (i + 1) until arr.length) {
      val c = StreamingEmbeddingDedup.cosine(arr(i)._2, arr(j)._2)
      if (BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.35)
        out += ((arr(j)._1, arr(i)._1)) // (later, earlier) by vec_id
    }
    out.result()
  }

  test("stream detections over 3 micro-batches equal the brute-force pair set") {
    import spark.implicits._
    val vs = corpus()
    val expected = bruteForcePairs(vs)
    assert(expected.nonEmpty, "corpus should contain near-dup pairs")

    val in = GraftSource.memory[(Long, Seq[Float])](spark)
    val det = StreamingEmbeddingDedup.detect(spark,
      in.toDS().toDF("vec_id", "embedding"))
    val q = det.writeStream.outputMode("append")
      .format("memory").queryName("emb_dedup_out").start()
    try {
      val chunks = vs.grouped((vs.size + 2) / 3).toSeq
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      // a pair sharing several bands emits once per matching bucket;
      // consumers take the distinct set (documented contract)
      val got = spark.table("emb_dedup_out").as[(Long, Long)].collect().toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("replayed vec_ids neither re-emit nor duplicate state (at-least-once safety)") {
    import spark.implicits._
    val vs = corpus().take(200)
    val expected = bruteForcePairs(vs)
    val in = GraftSource.memory[(Long, Seq[Float])](spark)
    val det = StreamingEmbeddingDedup.detect(spark,
      in.toDS().toDF("vec_id", "embedding"))
    val q = det.writeStream.outputMode("append")
      .format("memory").queryName("emb_dedup_replay").start()
    try {
      in.addData(vs.take(120)); q.processAllAvailable()
      val afterFirst = spark.table("emb_dedup_replay").count()
      // a PURE replay batch: every vector already admitted -> no new
      // emissions, no state growth visible as later duplicate matches
      in.addData(vs.slice(40, 120)); q.processAllAvailable()
      assert(spark.table("emb_dedup_replay").count() === afterFirst,
        "a pure replay batch must not re-emit matches")
      in.addData(vs.drop(120)); q.processAllAvailable()
      val got = spark.table("emb_dedup_replay").as[(Long, Long)].collect().toSet
      assert(got === expected)
    } finally q.stop()
  }
}
