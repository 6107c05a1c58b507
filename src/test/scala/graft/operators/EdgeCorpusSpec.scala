package graft.operators

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Regression pins for the r14 engine/oracle-divergence fixes on corpus
  * shapes the fixture never produces: segments whose sketches don't
  * overlap (ev_kmv_overlap's intersection row must be 0.0, not NULL) and
  * documents shorter than the 61-char dHash read window (mm_phash_dedup
  * must stay in-range and still pair identical shorts). Each test writes
  * a crafted parquet table into a temp dir and runs the REGISTRY query
  * against it — the exact code path the driver oracles. */
class EdgeCorpusSpec extends SparkTestBase {

  private def withTempDir[T](body: java.nio.file.Path => T): T = {
    val dir = Files.createTempDirectory("graft-edge")
    try body(dir)
    finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }

  test("ev_kmv_overlap: disjoint segments yield est_distinct 0.0, never NULL") {
    import spark.implicits._
    withTempDir { dir =>
      // early-half buyers 1..40, late-half buyers 101..140 — no overlap
      val early = (1L to 40L).map(c => (c, java.sql.Date.valueOf("1995-01-15")))
      val late = (101L to 140L).map(c => (c, java.sql.Date.valueOf("1997-06-15")))
      (early ++ late).toDF("o_custkey", "o_orderdate")
        .write.parquet(s"$dir/orders.parquet")

      val rows = EventOps.kmvOverlap.run(spark, dir.toString)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(3), r.getLong(4)))).toMap
      val (nSketch, est, exact) = rows("intersection")
      assert(nSketch == 0L && exact == 0L, s"disjoint corpus: ${rows("intersection")}")
      assert(est == 0.0, s"empty intersection must estimate 0.0, got $est")
      // both segments sit below K=64: their estimates are exact; the
      // 80-distinct union SATURATES the sketch, so its estimate rides the
      // (K-1)*2^48/h_K formula — within the ~1/sqrt(K) error band
      assert(rows("a_first_half") == ((40L, 40.0, 40L)), s"${rows("a_first_half")}")
      assert(rows("b_second_half") == ((40L, 40.0, 40L)), s"${rows("b_second_half")}")
      val (un, uest, uexact) = rows("union")
      assert(un == 64L && uexact == 80L, s"${rows("union")}")
      assert(math.abs(uest - 80.0) <= 0.375 * 80.0,
        s"saturated union estimate $uest vs exact 80")
    }
  }

  test("mm_phash_dedup: documents shorter than the 61-char window pair safely") {
    import spark.implicits._
    withTempDir { dir =>
      Seq(
        (1L, "short gradient text"),        // 19 chars — guard must hold
        (2L, "short gradient text"),        // identical: hamming 0 pair
        (3L, "x"),                          // 1 char: zero bits set
        (4L, "y"),                          // 1 char: zero bits set
        (5L, "a completely different short")) // near-misses stay apart
        .toDF("doc_id", "text")
        .write.parquet(s"$dir/documents.parquet")

      val rows = Multimodal.phashDedup.run(spark, dir.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      // identical texts -> identical signatures -> hamming 0
      assert(rows.contains((1L, 2L, 0)), s"${rows.toSeq}")
      // sub-2-char docs have dhash 0 (no in-range bit) -> they pair with
      // each other at hamming 0; that is the documented degenerate case
      assert(rows.contains((3L, 4L, 0)), s"${rows.toSeq}")
      // but no cross-pair between the distinct real texts at hamming <= 6
      assert(!rows.exists(p => p._1 == 1L && p._2 == 5L), s"${rows.toSeq}")
    }
  }
}
