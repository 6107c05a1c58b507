package graft.operators

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Z-order layout: the point of interleaving is that RANGE-partitioning the
  * z-value gives every partition a tight bounding box in BOTH dimensions,
  * so min/max file stats prune scans on either column. The spec measures
  * exactly that: total bounding-box area across 16 z-range partitions must
  * be a small fraction of what the same partitioning yields on the raw
  * row order (where each partition spans essentially the full plane). */
class ZOrderSpec extends SparkTestBase {

  private def boxArea(df: org.apache.spark.sql.DataFrame): Long =
    df.groupBy(spark_partition_id().as("p"))
      .agg(((max("x") - min("x") + lit(1)) * (max("y") - min("y") + lit(1))).as("area"))
      .agg(sum("area")).collect()(0).getLong(0)

  test("z-range partitions cover tight boxes in both dimensions") {
    val pts = Tables.t(spark, sf, "lineitem")
      .select((col("l_partkey") % 1024).as("x"), (col("l_suppkey") % 1024).as("y"))
    val z = pts.withColumn("_z", Sampling.zValue(col("x"), col("y"), 10))
    val zPart = z.repartitionByRange(16, col("_z")).drop("_z")
    val rowPart = pts.repartition(16) // round-robin: every partition spans the plane
    val (zArea, rowArea) = (boxArea(zPart), boxArea(rowPart))
    // 16 ideal z-tiles of a 1024x1024 plane cover 16 * (256*256) = 1/16 of
    // the naive full-plane-per-partition area; allow slack for ragged range
    // boundaries but require a decisive win
    assert(zArea < rowArea / 4,
      s"z-order layout not localized: z=$zArea vs row-order=$rowArea")
  }

  test("zorderWrite lays files out so both dimensions carry useful min/max stats") {
    val out = Files.createTempDirectory("graft-zorder").toString
    Sampling.zorderWrite(
      Tables.t(spark, sf, "lineitem")
        .select((col("l_partkey") % 1024).as("x"), (col("l_suppkey") % 1024).as("y")),
      "x", "y", bits = 10, partitions = 8, path = out)
    val back = spark.read.parquet(out)
    assert(back.count() === Tables.t(spark, sf, "lineitem").count())
    // per-file bounding boxes: read footer stats via the file list — cheap
    // proxy: group by input file name and check the same locality property
    val perFile = back.withColumn("f", input_file_name())
      .groupBy("f")
      .agg(((max("x") - min("x") + lit(1)) * (max("y") - min("y") + lit(1))).as("area"))
      .agg(sum("area")).collect()(0).getLong(0)
    assert(perFile < 1024L * 1024L * 8 / 4,
      s"per-file bounding boxes too loose: $perFile")
  }
}
