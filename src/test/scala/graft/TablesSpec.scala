package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp
import java.time.LocalDateTime

/** Type-discipline contract for the `events.ts` column.
  *
  * The driver's testdata generator has shipped `ts` in two physical parquet
  * shapes across regenerations:
  *   1. TIMESTAMP(NANOS) — Spark 4 refuses to read it natively; under
  *      `spark.sql.legacy.parquet.nanosAsLong` it surfaces as a nanosecond
  *      LongType (the r1–r7 shape);
  *   2. TIMESTAMP_MICROS with isAdjustedToUTC=0 — Spark 4 reads it as
  *      TIMESTAMP_NTZ (the r8 regeneration; it broke 7 operators and 12
  *      tests because `unix_micros` rejects NTZ).
  * `Tables.t` must normalize BOTH to session-TZ TimestampType so every
  * downstream `unix_micros`/window consumer sees one type, and with a UTC
  * session the two shapes of the same instant must produce the same value.
  * This spec writes a tiny parquet in each shape and runs the same
  * `unix_micros` query over both. */
class TablesSpec extends SparkTestBase {

  // one instant, expressed in both physical shapes
  private val microsOfInstant = 1735689600123456L // 2025-01-01T00:00:00.123456Z

  private def writeShapes(): String = {
    val dir = java.nio.file.Files.createTempDirectory("tables_ts").toString
    import spark.implicits._

    // Shape 1: nanos-as-long. Spark cannot WRITE parquet TIMESTAMP(NANOS),
    // but under nanosAsLong the read surfaces exactly as int64 — writing a
    // plain long column reproduces the surfaced DataFrame shape bit-for-bit
    // (LongType column named ts holding nanoseconds).
    Seq((1L, microsOfInstant * 1000L + 789L), (2L, microsOfInstant * 1000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/nanos_long/events.parquet")

    // Shape 2: NTZ-micros — Spark 4 writes TimestampNTZType as parquet
    // TIMESTAMP_MICROS isAdjustedToUTC=0, the r8 driver shape verbatim.
    val ldt = LocalDateTime.of(2025, 1, 1, 0, 0, 0, 123456000)
    Seq((1L, ldt), (2L, ldt.minusNanos(123456000L)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/ntz_micros/events.parquet")
    dir
  }

  test("Tables.t yields TimestampType ts for both physical shapes, same instants") {
    val dir = writeShapes()
    val shapes = Seq("nanos_long", "ntz_micros").map { shape =>
      val df = Tables.t(spark, s"$dir/$shape", "events")
      assert(df.schema("ts").dataType === TimestampType,
        s"$shape: ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
      // the unix_micros consumer every broken r8 operator used
      val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      shape -> got
    }.toMap
    // nanos floor-truncate to micros; NTZ under a UTC session is instant-preserving
    val expected = Seq((1L, microsOfInstant), (2L, microsOfInstant))
    assert(shapes("nanos_long") === expected)
    assert(shapes("ntz_micros") === Seq((1L, microsOfInstant), (2L, microsOfInstant - 123456L)))
  }

  test("driver testdata events.ts reads as TimestampType and unix_micros runs") {
    val ev = Tables.t(spark, sf, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    val n = ev.select(unix_micros(col("ts")).as("us")).filter(col("us").isNotNull).count()
    assert(n > 0)
  }

  test("normalizeTs leaves an already-TIMESTAMP ts and non-ts columns untouched") {
    import spark.implicits._
    val df = Seq((1L, Timestamp.from(java.time.Instant.ofEpochSecond(1735689600L)), 42L))
      .toDF("event_id", "ts", "other_long")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.schema("other_long").dataType === LongType)
    assert(out.collect() === df.collect())
  }
}
