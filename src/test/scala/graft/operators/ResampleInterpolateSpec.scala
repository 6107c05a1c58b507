package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

/** Hand-computed semantic pin for ev_resample_interpolate. The DuckDB
  * oracle mirrors the SAME formula, so a spec-level mistake (wrong frac
  * direction, off-by-one grid, wrong hold convention) would be green on
  * both engines — this fixture checks the arithmetic against values
  * computed by hand. */
class ResampleInterpolateSpec extends SparkTestBase {

  private val baseMs = 1735689600000L // 2025-01-01T00:00:00Z — 6h-aligned
  private def ts(hours: Int) = new Timestamp(baseMs + hours * 3600000L)

  test("linear interpolation at grid instants, exact hits, and tail hold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("resample_interp").toString
    Seq(
      // user 1: events at 00:00 (v=10) and 12:00 (v=20) — grid 0/6/12h
      (1L, ts(0), 1L, Some(10.0)),
      (2L, ts(12), 1L, Some(20.0)),
      // user 2: single event at 03:00 — grid start 06:00 > max, NO rows
      (3L, ts(3), 2L, Some(7.0)),
      // user 3: 05:00 (v=0) and 07:00 (v=4) — one grid point at 06:00
      (4L, ts(5), 3L, Some(0.0)),
      (5L, ts(7), 3L, Some(4.0)),
      // user 4: a NULL observation at 03:00 must not anchor — 06:00
      // interpolates 00:00 -> 12:00 straight through it
      (6L, ts(0), 4L, Some(2.0)),
      (7L, ts(3), 4L, None),
      (8L, ts(12), 4L, Some(10.0)))
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = EventOps.resampleInterpolate.run(spark, dir)
      .select("user_id", "grid_ts", "v_interp", "mode")
      .as[(Long, Timestamp, Double, String)].collect().toList

    assert(got == List(
      // exact hit at an event instant takes the event's value via frac=0
      (1L, ts(0), 10.0, "interp"),
      // midpoint: 10 + (20-10) * 6h/12h
      (1L, ts(6), 15.0, "interp"),
      // grid at the last event: nothing follows, value holds
      (1L, ts(12), 20.0, "hold"),
      // 05:00->07:00 at 06:00: 0 + (4-0) * 1h/2h
      (3L, ts(6), 2.0, "interp"),
      // user 4: the null at 03:00 is invisible to the anchors
      (4L, ts(0), 2.0, "interp"),
      (4L, ts(6), 6.0, "interp"),
      (4L, ts(12), 10.0, "hold")),
      s"got $got")
    // user 2's grid start (06:00) is past its only event — no rows at all
    assert(!got.exists(_._1 == 2L))
  }
}
