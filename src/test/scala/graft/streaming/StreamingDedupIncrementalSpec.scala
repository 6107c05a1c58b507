package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions.{greatest, least}

/** Incremental MinHash dedup: near-dups must be flagged against documents
  * seen in EARLIER micro-batches (state crosses batches), novel docs pass
  * silently, and the flagged pair points at the earlier doc. */
class StreamingDedupIncrementalSpec extends SparkTestBase {

  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "cat sleeps on the warm windowsill in the afternoon sun near the garden"

  test("cross-batch near-duplicates are flagged against the earlier doc") {
    import spark.implicits._
    val in = GraftSource.memory[(Long, String)](spark)
    val out = StreamingDedup.detect(spark, in.toDS().toDF("doc_id", "text"))
    val q = out.toDF("doc_id", "dup_of").writeStream
      .outputMode("append").format("memory").queryName("sdd_out").start()
    try {
      // batch 1: two unrelated docs
      in.addData((1L, base),
        (2L, "completely different words about spark catalyst planning and " +
          "shuffle exchanges in distributed query engines running at scale"))
      q.processAllAvailable()
      assert(spark.table("sdd_out").count() === 0, "novel docs must not be flagged")
      // batch 2: a near-copy of doc 1 (one word changed) + another novel doc
      in.addData((3L, base.replace("lazy", "sleepy")),
        (4L, "yet another unrelated document mentioning parquet files and " +
          "vectorized readers with whole stage codegen in the hot path"))
      q.processAllAvailable()
      val flagged: Map[Long, Long] = spark.table("sdd_out").as[(Long, Long)]
        .collect().toSeq
        .groupBy((p: (Long, Long)) => p._1)
        .map { case (d, hits) => d -> hits.map(_._2).min }
      assert(flagged === Map(3L -> 1L),
        s"doc 3 should duplicate doc 1 and nothing else, got $flagged")
      // batch 3: near-copy of doc 3 -> flagged against state from batch 2
      in.addData((5L, base.replace("lazy", "sleepy").replace("warm", "cold")))
      q.processAllAvailable()
      val flagged3: Map[Long, Long] = spark.table("sdd_out").as[(Long, Long)]
        .collect().toSeq
        .groupBy((p: (Long, Long)) => p._1)
        .map { case (d, hits) => d -> hits.map(_._2).min }
      assert(flagged3(5L) === 1L || flagged3(5L) === 3L,
        s"doc 5 should hit an earlier near-dup, got $flagged3")
    } finally q.stop()
  }

  test("banded signature agrees with the batch Dedup banding arithmetic") {
    import spark.implicits._
    val docs = Seq((10L, base), (11L, base)).toDF("doc_id", "text")
    val b = StreamingDedup.banded(docs)
    // identical text -> identical signature -> all 8 band hashes collide
    val collisions = b.groupBy("bh").count().filter($"count" === 2).count()
    assert(collisions === 8L)
  }

  test("batch-mode detect() finds exactly the pairs dedup_minhash_fast finds") {
    import spark.implicits._
    // same candidates, same verification threshold, same corpus -> the
    // streaming operator's flags must equal the batch pipeline's pairs
    val docs = graft.Tables.t(spark, sf, "documents").select("doc_id", "text")
    val streamed = StreamingDedup.detect(spark, docs)
      .toDF("doc_id", "dup_of")
      .select(least($"doc_id", $"dup_of").as("a"), greatest($"doc_id", $"dup_of").as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    val batch = graft.SparkEntry.queries("dedup_minhash_fast")(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(streamed === batch,
      s"streaming-only=${streamed -- batch} batch-only=${batch -- streamed}")
  }
}
