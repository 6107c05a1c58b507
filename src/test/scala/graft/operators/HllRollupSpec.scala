package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Property pin for ev_hll_rollup (bounded-oracled since r18: the DuckDB
  * row asserts exact side + verdict; the raw estimate stays engine-side):
  * the sketch-merge estimate must sit within its accuracy envelope for
  * EVERY week — recomputed here from the RAW sketch numbers so the
  * query's verdict column is checked against independent arithmetic —
  * and unioning daily sketches must equal sketching the whole week
  * directly (the re-aggregatability that justifies storing sketch
  * columns). */
class HllRollupSpec extends SparkTestBase {

  test("every weekly estimate is within 5% of exact, at multiple SFs") {
    import spark.implicits._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = graft.SparkEntry.queries("ev_hll_rollup")(spark, d)
        .select(col("within_5pct")).as[Boolean].collect()
      assert(rows.nonEmpty && rows.forall(identity),
        s"$d: some weekly estimate left the 5% envelope")
      // independent raw-number check: the verdict must follow from the
      // actual estimate, not merely agree with the oracle's TRUE literal
      val ev = graft.Tables.t(spark, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .withColumn("week", date_sub(col("day"), (dayofweek(col("day")) + 5) % 7))
      val raw = ev.groupBy(col("week"), col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy(col("week"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .join(ev.groupBy(col("week"))
          .agg(countDistinct(col("user_id")).as("exact")), "week")
        .select(col("est"), col("exact")).as[(Long, Long)].collect()
      assert(raw.nonEmpty)
      raw.foreach { case (est, exact) =>
        assert(math.abs(est - exact).toDouble / exact <= 0.05,
          s"$d: est=$est exact=$exact left the 5% envelope")
      }
    }
  }

  test("union of daily sketches equals the directly-sketched week") {
    val ev = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("week", date_sub(col("day"), (dayofweek(col("day")) + 5) % 7))
    val viaDays = ev.groupBy(col("week"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"))
    val joined = viaDays.join(direct, "week")
      .select(col("est"), col("est_direct")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        "daily-union estimate must equal the direct weekly sketch (merge exactness)")
    }
  }
}
