package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The public multimodal planning facade on user-supplied metadata frames
  * with hand-computed layouts. */
class MultimodalPlannerSpec extends SparkTestBase {

  test("shardManifest: start-offset sharding at a 100-byte budget") {
    import spark.implicits._
    // sizes 60, 60, 30, 80 -> starts 0, 60, 120, 150 -> shards 0, 0, 1, 1
    val sizes = Seq((1L, 60L), (2L, 60L), (3L, 30L), (4L, 80L)).toDF("id", "b")
    val rows = MultimodalPlanner.shardManifest(sizes, budgetBytes = 100L)
      .orderBy(col("shard_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq((0L, 2L, 120L, 1L, 2L), (1L, 2L, 110L, 3L, 4L)),
      s"${rows.toSeq}")
    intercept[IllegalArgumentException] {
      MultimodalPlanner.shardManifest(sizes, budgetBytes = 0L)
    }
  }

  test("audioWindows: window/hop grid with a truncated tail; shorts keep one window") {
    import spark.implicits._
    // 10 bytes @ 1 byte/sample, window 4, hop 2 -> floor((10-4)/2)+1 = 4
    // windows at offsets 0,2,4,6; last is full (6+4=10)
    val sizes = Seq((1L, 10L), (2L, 3L)).toDF("id", "b")
    val rows = MultimodalPlanner.audioWindows(sizes,
      windowSamples = 4, hopSamples = 2, bytesPerSample = 1)
      .orderBy(col("doc_id"), col("win")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 0, 0L, 4L), (1L, 1, 2L, 4L), (1L, 2, 4L, 4L), (1L, 3, 6L, 4L),
      (2L, 0, 0L, 3L)), // sub-window payload: one truncated window
      s"${rows.toSeq}")
  }

  test("patchGrid: aspect-preserving fit, ceil patches, CLS token") {
    import spark.implicits._
    val dims = Seq(
      (1L, 448, 224),   // downscale 0.5 -> 224x112 -> 14x7 + 1 = 99
      (2L, 100, 50))    // already fits -> 100x50 -> 7x4 + 1 = 29
      .toDF("id", "w", "h")
    val rows = MultimodalPlanner.patchGrid(dims).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(rows.toSeq == Seq(
      (1L, 224, 112, 14, 7, 99), (2L, 100, 50, 7, 4, 29)), s"${rows.toSeq}")
  }

  test("sceneCuts: planted luma jumps segment scenes; quiet videos are one scene") {
    import spark.implicits._
    // video 1: jumps at frames 3 (|200-11|) and 5 (|50-205|) at threshold
    // 100 -> scenes [0..2], [3..4], [5]; video 2: flat -> one scene
    val frames = Seq(
      (1L, 0L, 10.0), (1L, 1L, 12.0), (1L, 2L, 11.0),
      (1L, 3L, 200.0), (1L, 4L, 205.0), (1L, 5L, 50.0),
      (2L, 0L, 7.0), (2L, 1L, 8.0)).toDF("vid", "f", "luma")
    val rows = MultimodalPlanner.sceneCuts(frames, threshold = 100.0)
      .orderBy(col("video_id"), col("scene"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 3L), (1L, 1L, 3L, 2L), (1L, 2L, 5L, 1L),
      (2L, 0L, 0L, 2L)), s"${rows.toSeq}")
    intercept[IllegalArgumentException] {
      MultimodalPlanner.sceneCuts(frames, threshold = 0)
    }
  }
}
