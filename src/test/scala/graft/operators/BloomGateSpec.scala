package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Property gate for the broadcast-Bloom ingest twin: the Bloom gate must
  * lose NOTHING (no false negatives — the property that makes
  * dedup_ingest_delta_bloom share the exact variant's oracle) and its
  * false-positive rate — the only cost of the gate, paid as residual
  * anti-join traffic — must sit within the configured sizing bound. */
class BloomGateSpec extends SparkTestBase {

  private def bloomAggSql =
    s"(SELECT graft_bloom_agg(xxhash64(h), ${Dedup.IngestBloomEstItems}L, " +
      s"${Dedup.IngestBloomNumBits}L) FROM bg_snap)"

  test("bloom ingest gate: identical delta, zero false negatives, FP rate within the configured bound") {
    graft.functions.BloomFunctions.ensureRegistered(spark)
    val exact = Dedup.ingestDelta.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bloom = Dedup.ingestDeltaBloom.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(exact.nonEmpty)
    assert(bloom == exact,
      "the Bloom-gated delta must equal the exact anti-join delta")

    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
    docs.filter(col("doc_id") % 7 === 0).select("h")
      .createOrReplaceTempView("bg_snap")
    docs.filter(col("doc_id") % 7 =!= 0).select("doc_id", "h")
      .createOrReplaceTempView("bg_inc")

    // no false negatives: every member digest tests positive
    val falseNegatives = spark.sql(
      s"""SELECT count(*) FROM bg_snap
          WHERE NOT graft_might_contain($bloomAggSql, xxhash64(h))""")
      .head().getLong(0)
    assert(falseNegatives == 0L,
      "a Bloom filter must never report a member absent")

    // measured FP rate over truly-new incoming digests vs the ~3% the
    // 7.3 bits/item sizing buys at FULL capacity (we are far under
    // capacity here, so the measured rate should clear it easily)
    val row = spark.sql(
      s"""WITH truly_new AS (
            SELECT h FROM bg_inc WHERE h NOT IN (SELECT h FROM bg_snap))
          SELECT count(*),
            sum(CASE WHEN graft_might_contain($bloomAggSql, xxhash64(h))
                     THEN 1 ELSE 0 END)
          FROM truly_new""").head()
    val n = row.getLong(0)
    val fp = row.getLong(1)
    assert(n > 0)
    val rate = fp.toDouble / n
    assert(rate <= 0.03, s"measured FP rate $rate exceeds the configured 3% bound")
    info(s"bloom gate: $fp/$n false positives (rate $rate, bound 0.03)")
  }
}
