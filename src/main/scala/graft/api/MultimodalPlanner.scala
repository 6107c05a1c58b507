package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** PUBLIC multimodal PLANNING facade over arbitrary metadata frames — the
  * library surface for the engine's byte-layout planners (the registry's
  * mm_* queries demonstrate them on the fixture's derived sizes; this is
  * what a user with a real media corpus calls on their own metadata). The
  * planners are deliberately METADATA-ONLY: they consume (id, n_bytes) or
  * (id, w, h) frames — never payloads — so a 100 TB corpus plans its
  * shard layout, featurization grid and token budget from a
  * columns-pruned parquet scan of stats, with the opaque binary columns
  * untouched until the (stubbed) decode stage actually runs. Same code as
  * the registry queries (`Multimodal`'s helpers), re-exported with public
  * contracts; all column conventions positional. */
object MultimodalPlanner {

  private def sized(df: DataFrame): DataFrame = {
    require(df.columns.length == 2,
      s"expected a two-column (id, n_bytes) frame, got ${df.columns.length} columns")
    val idType = df.schema(df.columns.head).dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(idType),
      s"planner frames need an integral id column, got $idType")
    df.toDF("doc_id", "n_bytes")
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_bytes").cast("long").as("n_bytes"))
  }

  /** WebDataset-style shard manifest: split the virtual concatenated byte
    * stream into fixed-budget shards; a sample's shard is decided by its
    * start offset (closed-form greedy — the running offset is the
    * two-phase distributed prefix sum, no serial scan).
    * @param sizes (id, n_bytes) — any column names
    * @return (shard_id, n_samples, shard_bytes, first_doc, last_doc) */
  def shardManifest(sizes: DataFrame, budgetBytes: Long = 1L << 30): DataFrame = {
    val d = sized(sizes)
    Multimodal.shardManifestOf(d.sparkSession, d, budgetBytes)
  }

  /** Fixed-window/hop featurization grid over PCM payloads (the ASR
    * convention, e.g. 16000/8000 samples at 16 kHz): per-window byte
    * (offset, length); short payloads yield one truncated window, so no
    * sample is ever silently dropped. Pure scan-side explode.
    * @param sizes (id, n_bytes) — any column names
    * @return (doc_id, win, byte_off, byte_len) */
  def audioWindows(sizes: DataFrame, windowSamples: Int = 16000,
      hopSamples: Int = 8000, bytesPerSample: Int = 2): DataFrame =
    Multimodal.audioWindowsOf(sized(sizes), windowSamples, hopSamples,
      bytesPerSample)

  /** ViT patch-grid plan: aspect-preserving downscale to fit `target`
    * (never upscale), ceil-divided into `patch`-size patches (partial
    * edge patches pad, never drop) plus the CLS token — the sequence
    * length each image contributes to a multimodal packing budget.
    * @param dims (id, width, height) — any column names
    * @return (doc_id, out_w, out_h, patches_x, patches_y, seq_len) */
  def patchGrid(dims: DataFrame, target: Int = 224, patch: Int = 16): DataFrame = {
    require(dims.columns.length == 3,
      s"expected a three-column (id, w, h) frame, got ${dims.columns.length} columns")
    Multimodal.patchGridOf(dims.toDF("doc_id", "w", "h"), target, patch)
  }

  /** Shot-boundary segmentation over USER-SUPPLIED per-frame features
    * (mean luma, embedding norm, any scalar the decode stage emitted):
    * a scene ends where |feature(i) − feature(i−1)| > `threshold`, and
    * frames between cuts collapse to (scene, start_frame, length) rows —
    * the segmentation that samples frames per SCENE instead of a fixed
    * stride (the registry's mm_scene_cuts on real features instead of
    * its stub-hash luma). One video-keyed window pass (lag + prefix
    * count), bounded by frame counts — the feature column is the only
    * payload-derived input, so the planner stays metadata-only.
    * @param frames (video_id, frame_idx, feature) — any column names
    * @return (video_id, scene, start_frame, scene_len) */
  def sceneCuts(frames: DataFrame, threshold: Double = 160.0): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(frames.columns.length == 3,
      s"expected a three-column (video_id, frame_idx, feature) frame, got ${frames.columns.length} columns")
    val named = frames.toDF("video_id", "frame_idx", "feat")
    // typed contract, not a silent cast: a string feature column would
    // cast unparseable values to null, the cut predicate would never fire
    // around them, and every video would collapse to one scene with no
    // error (r16 third review)
    val idxType = named.schema("frame_idx").dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(idxType),
      s"sceneCuts needs an integral frame_idx column, got $idxType")
    val featType = named.schema("feat").dataType.typeName
    require(Seq("byte", "short", "integer", "long", "float", "double")
        .contains(featType) || featType.startsWith("decimal"),
      s"sceneCuts needs a numeric feature column, got $featType")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("video_id")).orderBy(col("frame_idx"))
    val cuts = named
      .select(col("video_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("feat").cast("double").as("feat"))
      .withColumn("prev", lag(col("feat"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNotNull &&
          abs(col("feat") - col("prev")) > threshold, 1).otherwise(0))
      .select(col("video_id"), col("frame_idx"), col("cut"))
    Multimodal.scenesFromCuts(cuts)
  }
}
