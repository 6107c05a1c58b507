package graft.api

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The public event facade on user-supplied frames (arbitrary column
  * names, events the fixture never shaped) with hand-computed planted
  * expectations — the "switch to this library" contract. */
class EventAnalyticsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("sessionize: 30-min gap splits a planted trace into exact sessions") {
    import spark.implicits._
    // user 1: events at 0, 10, 20 (one session), then 60, 65 (second);
    // user 2: single event
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(20), 4.0),
      (1L, ts(60), 8.0), (1L, ts(65), 16.0),
      (2L, ts(5), 32.0)).toDF("who", "when", "amount")
    val rows = EventAnalytics.sessionize(ev)
      .orderBy(col("user_id"), col("session_start"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1L, ts(0), 3L, 7.0), (1L, ts(60), 2L, 24.0), (2L, ts(5), 1L, 32.0)),
      s"${rows.toSeq}")
  }

  test("windowedCounts: tumbling hour buckets; sliding doubles coverage") {
    import spark.implicits._
    val ev = Seq(
      ("a", ts(10), 1.0), ("a", ts(50), 2.0), ("a", ts(70), 4.0),
      ("b", ts(10), 8.0)).toDF("k", "t", "v")
    val tumb = EventAnalytics.windowedCounts(ev).orderBy(col("w_start"), col("event_type"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(tumb.toSeq == Seq(
      (ts(0), "a", 2L, 3.0), (ts(0), "b", 1L, 8.0), (ts(60), "a", 1L, 4.0)),
      s"${tumb.toSeq}")
    // 30-min slide: each event lands in 2 windows
    val slid = EventAnalytics.windowedCounts(ev, "1 hour", "30 minutes")
    assert(slid.agg(sum(col("n"))).head().getLong(0) == 8L,
      "every event must land in exactly 2 sliding windows")
  }

  test("asOfJoin: latest right at-or-before; equal ts counts; no-prior rows drop") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), 100L),  // right at 5 -> asof 5
      (1L, ts(30), 101L),  // right at 30 (equal) -> asof 30
      (2L, ts(10), 102L))  // no right for key 2 -> dropped
      .toDF("k", "t", "id")
    val right = Seq((1L, ts(5)), (1L, ts(30)), (1L, ts(45))).toDF("k", "t")
    val rows = EventAnalytics.asOfJoin(left, right)
      .orderBy(col("lid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(3)))
    assert(rows.toSeq == Seq((100L, 1L, ts(5)), (101L, 1L, ts(30))),
      s"${rows.toSeq}")
  }

  test("funnel: first-step-before-last-step gate with exact counts") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "view", ts(5)), (1L, "buy", ts(10)), // converts
      (2L, "buy", ts(0)), (2L, "view", ts(5)),                       // buy first: no
      (3L, "view", ts(0))).toDF("u", "e", "t")                       // never buys
    val rows = EventAnalytics.funnel(ev, "view", "buy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 2L, 1L)), s"${rows.toSeq}")
  }

  test("input contracts fail loudly") {
    import spark.implicits._
    val two = Seq((1L, ts(0))).toDF("a", "b")
    intercept[IllegalArgumentException] { EventAnalytics.sessionize(two) }
    intercept[IllegalArgumentException] {
      EventAnalytics.asOfJoin(two, Seq((1L, ts(0), 1L)).toDF("a", "b", "c"))
    }
    intercept[IllegalArgumentException] { EventAnalytics.forwardFill(two) }
    intercept[IllegalArgumentException] { EventAnalytics.rateLimit(two) }
    intercept[IllegalArgumentException] {
      EventAnalytics.resample(two.withColumn("c", col("a"))
        .withColumn("d", col("a")), stepSeconds = 0L)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.cohortRetention(two.withColumn("c", col("a")))
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelSteps(two, "a", "b", "c")
    }
  }

  test("forwardFill: nulls take the latest prior reading per key; a leading null stays null") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts(0), Some(1.0)), (2L, 1L, ts(10), None),
      (3L, 1L, ts(20), Some(3.0)), (4L, 1L, ts(30), None),
      (5L, 2L, ts(0), None)) // key 2 never observes: stays null
      .toDF("row id", "sensor.key", "at", "reading")
    val rows = EventAnalytics.forwardFill(ev).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq == Seq(
      1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(3.0), 4L -> Some(3.0),
      5L -> None), s"${rows.toSeq}")
  }

  test("resample: LOCF holds the last reading; linear interpolates exactly between anchors") {
    import spark.implicits._
    // key 1: readings 1.0 @ 0 min and 5.0 @ 60 min; 30-min grid =
    // {0, 30, 60} -> LOCF (1, 1, 5); linear (1, 3, 5) with the last
    // point 'hold' (grid instant coincides with the final observation)
    val ev = Seq(
      (1L, 1L, ts(0), 1.0), (2L, 1L, ts(60), 5.0),
      (3L, 2L, ts(0), 7.0)) // single observation: one grid point
      .toDF("id", "k", "t", "v")
    val locf = EventAnalytics.resample(ev, stepSeconds = 1800L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    assert(locf.toSeq == Seq(
      (1L, ts(0), 1.0), (1L, ts(30), 1.0), (1L, ts(60), 5.0),
      (2L, ts(0), 7.0)), s"${locf.toSeq}")
    val lin = EventAnalytics.resample(ev, stepSeconds = 1800L, linear = true)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getString(3)))
    assert(lin.toSeq == Seq(
      (1L, ts(0), 1.0, "interp"), (1L, ts(30), 3.0, "interp"),
      (1L, ts(60), 5.0, "hold"), (2L, ts(0), 7.0, "hold")), s"${lin.toSeq}")
  }

  test("rateLimit: at most maxPer per key per unit, earliest first") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(1)), (3L, 1L, ts(2)), // 3 same-day: keep 2
      (4L, 2L, ts(5)))
      .toDF("event", "who", "when")
    val kept = EventAnalytics.rateLimit(ev, maxPer = 2)
      .collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L, 2L, 4L), s"${kept.toSeq}")
    // hourly quota of 1: ts(0) and ts(1) share the hour
    val hourly = EventAnalytics.rateLimit(ev, maxPer = 1, per = "hour")
      .collect().map(_.getLong(0))
    assert(hourly.toSeq == Seq(1L, 4L), s"${hourly.toSeq}")
  }

  test("anomalyZScore: the planted spike clears 3 sigma; constant groups drop") {
    import spark.implicits._
    // group g: nine 0.0s and one 10.0 -> mean 1, std 3, z(10) = 3.0
    val ev = ((1L to 9L).map(i => (i, "g", 0.0)) :+ ((10L, "g", 10.0))) ++
      Seq((11L, "flat", 5.0), (12L, "flat", 5.0)) // std 0: dropped
    val rows = EventAnalytics.anomalyZScore(ev.toDF("id", "grp", "x"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    assert(rows.toSeq == Seq((10L, "g", 3.0)), s"${rows.toSeq}")
    // a tighter threshold flags nothing extra here; a looser one adds the -0.3333 rows
    assert(EventAnalytics.anomalyZScore(ev.toDF("id", "grp", "x"), 0.3).count() == 10L)
  }

  test("cohortRetention: first-seen week buckets with exact offsets") {
    import spark.implicits._
    val mon1 = Timestamp.valueOf("2024-01-01 10:00:00") // Monday, week 0
    val mon2 = Timestamp.valueOf("2024-01-08 10:00:00") // Monday, week 1
    val ev = Seq(
      (1L, mon1), (1L, mon2), // cohort wk0, active wk0 + wk1
      (2L, mon2))             // cohort wk1
      .toDF("u", "t")
    val rows = EventAnalytics.cohortRetention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L), ("2024-01-08", 0, 1L)),
      s"${rows.toSeq}")
  }

  test("funnelSteps: strict ordered cascade with exact micro-rates") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", ts(0)), (1L, "b", ts(10)), (1L, "c", ts(20)), // full cascade
      (2L, "b", ts(0)), (2L, "a", ts(10)),                    // b precedes a: no step 2
      (3L, "a", ts(0)))                                       // step 1 only
      .toDF("u", "e", "t")
    val rows = EventAnalytics.funnelSteps(ev, "a", "b", "c")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "a", 3L, 1000000L, 1000000L),
      (2, "b_after_a", 1L, 333333L, 333333L),
      (3, "c_after_b", 1L, 1000000L, 333333L)), s"${rows.toSeq}")
  }

  test("rateLimit rejects units date_trunc would NULL out; anomaly stats exclude nulls") {
    import spark.implicits._
    // "days" (plural) is not a date_trunc unit: it used to make every
    // window_start NULL and throttle each key to maxPer events TOTAL
    val ev = Seq((1L, 1L, ts(0)), (2L, 1L, ts(1))).toDF("a", "b", "c")
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.rateLimit(ev, maxPer = 1, per = "days")
    }
    assert(e.getMessage.contains("date_trunc"), e.getMessage)
    // null values must not count into the group size: 5 non-null values
    // (0,0,0,0,10) have mean 2, std 4 -> z(10) = 2.0 exactly; counting
    // the 5 nulls into n used to bias the stats to mean 1 / std 3 ->
    // z = 3.0 (and z(0) from -0.5 to -0.33)
    val vals = Seq[(Long, String, java.lang.Double)](
      (1L, "m", 0.0), (2L, "m", 0.0), (3L, "m", 0.0), (4L, "m", 0.0),
      (5L, "m", 10.0),
      (6L, "m", null), (7L, "m", null), (8L, "m", null), (9L, "m", null),
      (10L, "m", null)).toDF("id", "grp", "v")
    val flagged = EventAnalytics.anomalyZScore(vals, threshold = 1.5)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(flagged.toSeq == Seq((5L, 2.0)),
      s"unbiased z must be exactly 2.0: ${flagged.toSeq}")
  }

  test("transitionMatrix + firstTouchAttribution: hand-computed hop counts and credit shares") {
    import spark.implicits._
    // u1: ad -> click -> purchase -> purchase; u2: email -> click ->
    // purchase; u3: ad -> click (never converts)
    val ev = Seq(
      (1L, 1L, ts(0), "ad"), (2L, 1L, ts(1), "click"),
      (3L, 1L, ts(2), "purchase"), (4L, 1L, ts(3), "purchase"),
      (5L, 2L, ts(0), "email"), (6L, 2L, ts(1), "click"),
      (7L, 2L, ts(2), "purchase"),
      (8L, 3L, ts(0), "ad"), (9L, 3L, ts(1), "click")
    ).toDF("eid", "who", "when", "kind")
    val tm = EventAnalytics.transitionMatrix(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tm == Map(
      ("ad", "click") -> 2L, ("click", "purchase") -> 2L,
      ("purchase", "purchase") -> 1L, ("email", "click") -> 1L), s"$tm")
    val attr = EventAnalytics.firstTouchAttribution(ev, conversion = "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // ad opened for u1 (2 purchases of 3 total: 666666 micro), email for
    // u2 (1 of 3: 333333); u3 never converted and credits nothing
    assert(attr == Map(
      "ad" -> ((1L, 2L, 666666L)), "email" -> ((1L, 1L, 333333L))), s"$attr")
  }

  test("degenerate inputs: the six r15 facade functions flow empty frames through") {
    import spark.implicits._
    val e4 = Seq.empty[(Long, Long, Timestamp, Double)].toDF("a", "b", "c", "d")
    val e3 = Seq.empty[(Long, Long, Timestamp)].toDF("a", "b", "c")
    assert(EventAnalytics.forwardFill(e4).count() == 0)
    assert(EventAnalytics.resample(e4).count() == 0)
    assert(EventAnalytics.resample(e4, linear = true).count() == 0)
    assert(EventAnalytics.rateLimit(e3).count() == 0)
    assert(EventAnalytics.anomalyZScore(
      Seq.empty[(Long, String, Double)].toDF("a", "b", "c")).count() == 0)
    assert(EventAnalytics.cohortRetention(
      Seq.empty[(Long, Timestamp)].toDF("a", "b")).count() == 0)
    // an empty funnel still renders the 3-row dashboard table, all zero
    val f = EventAnalytics.funnelSteps(
      Seq.empty[(Long, String, Timestamp)].toDF("a", "b", "c"), "x", "y", "z")
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(f.toSeq == Seq((1, 0L), (2, 0L), (3, 0L)), s"${f.toSeq}")
  }

  test("degenerate inputs: empty frames flow through; equal-ts right rows tie-break deterministically") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Timestamp, Double)].toDF("u", "t", "v")
    assert(EventAnalytics.sessionize(empty).count() == 0)
    assert(EventAnalytics.windowedCounts(
      Seq.empty[(String, Timestamp, Double)].toDF("k", "t", "v")).count() == 0)
    assert(EventAnalytics.funnel(
      Seq.empty[(Long, String, Timestamp)].toDF("u", "e", "t"), "a", "b").count() == 0)
    // duplicate right timestamps: the as-of pick is still the latest ts
    // (ties collapse to one value), never a row explosion
    val left = Seq((1L, ts(10), 7L)).toDF("k", "t", "id")
    val right = Seq((1L, ts(5)), (1L, ts(5)), (1L, ts(5))).toDF("k", "t")
    val rows = EventAnalytics.asOfJoin(left, right).collect()
    assert(rows.length == 1 && rows.head.getTimestamp(3) == ts(5), s"${rows.toSeq}")
  }

  test("windowedCounts runs natively on a stream (complete mode) and matches batch") {
    import spark.implicits._
    val data = Seq(("a", ts(10), 1.0), ("a", ts(50), 2.0), ("b", ts(70), 4.0))
    val truth = EventAnalytics.windowedCounts(data.toDF("k", "t", "v"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1.getTime, x._2))
    val in = graft.streaming.GraftSource.memory[(String, Timestamp, Double)](spark)
    val q = EventAnalytics.windowedCounts(in.toDS().toDF("k", "t", "v"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("ev_api_stream").start()
    try {
      in.addData(data: _*); q.processAllAvailable()
      val streamed = spark.table("ev_api_stream")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1.getTime, x._2))
      assert(streamed.sameElements(truth),
        s"stream ${streamed.toSeq} != batch ${truth.toSeq}")
    } finally q.stop()
  }

  // ------------------------------------------------------- alerting family

  test("cepPairs: latest-first-wins within the window; same-ts never pairs") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A", ts(0)), (1L, "B", ts(2)),            // pair gap 2 min
      (1L, "A", ts(10)), (1L, "A", ts(12)),
      (1L, "B", ts(13)),                             // latest A (12) wins
      (1L, "B", ts(30)),                             // 18 min > 5 min: no
      (2L, "B", ts(5)),                              // no prior A
      (3L, "A", ts(7)), (3L, "B", ts(7)),            // equal ts: no pair
      (3L, "B", ts(9))                               // strictly-earlier A(7)
    ).toDF("who", "kind", "at")
    val rows = EventAnalytics.cepPairs(ev, "A", "B")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, ts(0), ts(2), 120000L), (1L, ts(12), ts(13), 60000L),
      (3L, ts(7), ts(9), 120000L)), s"${rows.toSeq}")
  }

  test("absence: unanswered firsts alert with their deadline; same-ts answers don't count") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A", ts(0)), (1L, "B", ts(2)),   // answered
      (1L, "A", ts(40)), (1L, "B", ts(50)), // 10 min late: alert
      (2L, "A", ts(5)), (2L, "B", ts(5))    // same ts doesn't answer: alert
    ).toDF("who", "kind", "at")
    val rows = EventAnalytics.absence(ev, "A", "B")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    assert(rows.toSeq == Seq(
      (1L, ts(40), ts(45)), (2L, ts(5), ts(10))), s"${rows.toSeq}")
  }

  test("cepSequence (batch leg): strict-order chains, non-overlapping restart, expiry drops partials") {
    import spark.implicits._
    val ev = Seq(
      // u1: two back-to-back full chains (greedy restart after a match)
      (1L, "a", ts(0)), (1L, "b", ts(2)), (1L, "c", ts(4)),
      (1L, "a", ts(5)), (1L, "b", ts(6)), (1L, "c", ts(7)),
      // u2: out-of-order step ignored, chain still completes
      (2L, "a", ts(0)), (2L, "c", ts(1)), (2L, "b", ts(2)), (2L, "c", ts(3)),
      // u3: chain expires (b lands 15 min after a at a 10-min window)
      (3L, "a", ts(0)), (3L, "b", ts(15)), (3L, "c", ts(16))
    ).toDF("who", "kind", "at")
    val rows = EventAnalytics.cepSequence(ev, Seq("a", "b", "c"),
        withinSeconds = 600L)
      .orderBy(col("key"), col("start_ts"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
    assert(rows.toSeq == Seq(
      ("1", ts(0), ts(4)), ("1", ts(5), ts(7)), ("2", ts(0), ts(3))),
      s"${rows.toSeq}")
  }

  test("anomalyMad: exact integer medians; the planted outlier is the only flag; constant groups report zero") {
    import spark.implicits._
    val ev = ((1 to 9).map(i => ("g", i.toDouble)) :+ (("g", 100.0))) ++
      Seq(("h", 5.0), ("h", 5.0), ("h", 5.0))
    val rows = EventAnalytics.anomalyMad(ev.toDF("grp", "v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    // g: median 5.5e6 micros, MAD 2.5e6, only 100.0 clears 3 MADs
    assert(rows.toSeq == Seq(
      ("g", 10L, 5500000.0, 2500000.0, 1L),
      ("h", 3L, 5000000.0, 0.0, 0L)), s"${rows.toSeq}")
  }

  test("cusumChangepoint: the planted level shift locates at the step; short series stay silent") {
    import spark.implicits._
    // key 1: 0,0,0,0 then 10,10,10,10 — the max |n·prefix − k·total|
    // lands on k = 4 (the last pre-shift row); key 2 has n < 8
    val ev = (1 to 8).map(i =>
        (i.toLong, 1L, ts(i - 1), if (i <= 4) 0.0 else 10.0)) ++
      Seq((9L, 2L, ts(0), 1.0), (10L, 2L, ts(1), 5.0))
    val rows = EventAnalytics.cusumChangepoint(ev.toDF("id", "who", "at", "v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getTimestamp(3),
        r.getLong(4)))
    assert(rows.toSeq == Seq((1L, 8L, 4, ts(3), 160000000L)), s"${rows.toSeq}")
  }

  test("pageHinkley: quiet series never alarms; the planted drift does") {
    import spark.implicits._
    val ev = (1 to 40).map(i =>
      (i.toLong, 1L, ts(i), if (i <= 20) 0.0 else 10.0))
    val rows = EventAnalytics.pageHinkley(ev.toDF("id", "who", "at", "v"),
        lambda = 5.0)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(rows.length == 40, "one emission per observation")
    assert(rows.take(20).forall(!_._3), "no alarm before the drift")
    assert(rows.drop(20).exists(_._3), "the level shift must alarm")
    // the PH statistic is non-decreasing across the shifted tail (mean
    // lags far below 10, so each post-shift deviation is positive)
    val tail = rows.drop(20).map(_._2)
    assert(tail.zip(tail.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"${tail.toSeq}")
  }

  test("scd2History: last state of the day wins; equal-state runs collapse; open interval is current") {
    import spark.implicits._
    def dayTs(d: Int, minute: Int): Timestamp =
      new Timestamp((d * 1440L + minute) * 60000L)
    val ev = Seq(
      (1L, dayTs(0, 10), 1L, "x"), (1L, dayTs(0, 20), 2L, "y"), // day0 -> y
      (1L, dayTs(1, 0), 3L, "y"),                               // run continues
      (1L, dayTs(2, 0), 4L, "z")                                // change
    ).toDF("who", "at", "id", "st")
    val rows = EventAnalytics.scd2History(ev)
      .orderBy(col("valid_from"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
        r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      (1L, "y", "1970-01-01", Some("1970-01-03"), false),
      (1L, "z", "1970-01-03", None, true)), s"${rows.toSeq}")
  }

  test("cepSequence runs natively on a STREAM: the watermark survives the facade's renames, matches equal batch") {
    import spark.implicits._
    // r16 review finding 1 (CONFIRMED): an unconditional cast("timestamp")
    // on the ts column stripped the caller's watermark tag, so the
    // streaming leg's EventTimeTimeout was rejected at query start for
    // every caller. This arm drives the facade's streaming branch
    // end-to-end and pins stream == batch on the same trace.
    // Timestamps sit a day off epoch: a stream's INITIAL watermark is
    // epoch 0, and rows at exactly the watermark are dropped as late —
    // an epoch-0 fixture would lose its first events to that collision
    // (found live), which no real event log ever hits.
    def tsd(minute: Int): Timestamp =
      new Timestamp(86400000L + minute * 60000L)
    val data = Seq(
      (1L, "a", tsd(0)), (1L, "b", tsd(2)), (1L, "c", tsd(4)),
      (1L, "a", tsd(5)), (1L, "b", tsd(6)), (1L, "c", tsd(7)),
      (2L, "a", tsd(0)), (2L, "c", tsd(1)), (2L, "b", tsd(2)), (2L, "c", tsd(3)))
    val truth = EventAnalytics.cepSequence(
        data.toDF("who", "kind", "at"), Seq("a", "b", "c"), 600L)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    assert(truth.size == 3, s"fixture sanity: $truth")
    val in = graft.streaming.GraftSource.memory[(Long, String, Timestamp)](spark)
    val q = EventAnalytics.cepSequence(
        in.toDS().toDF("who", "kind", "at").withWatermark("at", "10 minutes"),
        Seq("a", "b", "c"), 600L)
      .writeStream.outputMode("append").format("memory")
      .queryName("cep_seq_stream").start()
    try {
      in.addData(data: _*); q.processAllAvailable()
      val streamed = spark.table("cep_seq_stream").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(streamed == truth, s"stream $streamed != batch $truth")
    } finally q.stop()
  }

  // ------------------------------------------------- experimentation family

  test("abLift + powerAnalysis: hand-computed z-test and MDE on a planted 4v4 experiment") {
    import spark.implicits._
    // arm A (control): 4 units, 1 conversion; arm B: 4 units, 3 conversions
    val assigns = Seq(
      (1L, "control", false), (2L, "control", true),
      (3L, "control", false), (4L, "control", false),
      (5L, "treat", true), (6L, "treat", true),
      (7L, "treat", false), (8L, "treat", true)).toDF("u", "arm", "won")
    val lift = EventAnalytics.abLift(assigns, control = "control").head()
    assert((lift.getLong(0), lift.getLong(1), lift.getLong(2), lift.getLong(3))
      == ((4L, 1L, 4L, 3L)), s"$lift")
    assert(lift.getLong(4) == 250000L && lift.getLong(5) == 750000L)
    assert(lift.getLong(6) == 2000000L, "relative lift 3x - 1 = +200%")
    // pooled p = 0.5, se = sqrt(.25 * 8/16), diff = 0.5 -> z = sqrt(2)
    val zExp = math.floor((0.75 - 0.25) /
      math.sqrt(0.5 * 0.5 * (8.0 / 16.0)) * 1000000).toLong
    assert(lift.getLong(7) == zExp, s"z ${lift.getLong(7)} vs $zExp")

    val pw = EventAnalytics.powerAnalysis(assigns, control = "control").head()
    assert((pw.getLong(0), pw.getLong(1), pw.getLong(2), pw.getLong(3))
      == ((4L, 4L, 4L, 500000L)), s"$pw")
    val zs = 1.959964 + 0.841621
    val mdeExp = math.floor(zs * math.sqrt(2.0 * 0.5 * 0.5 / 4) * 1e6 + 0.5).toLong
    assert(pw.getLong(4) == mdeExp, s"mde ${pw.getLong(4)} vs $mdeExp")
    val nExp = math.ceil(2.0 * 0.5 * 0.5 * (zs * zs) /
      ((0.05 * 0.5) * (0.05 * 0.5))).toLong
    assert(pw.getLong(5) == nExp, s"n ${pw.getLong(5)} vs $nExp")
  }

  test("abLift contracts: case-mismatched control, one-arm frames and null variants fail loudly") {
    import spark.implicits._
    // r16 review finding 2: these used to return an all-null z-test row
    val assigns = Seq((1L, "control", true), (2L, "treat", false))
      .toDF("u", "arm", "won")
    val wrongCase = intercept[IllegalArgumentException] {
      EventAnalytics.abLift(assigns, control = "Control")
    }
    assert(wrongCase.getMessage.contains("matched no assignment row"),
      wrongCase.getMessage)
    intercept[IllegalArgumentException] { // every row is control: no B arm
      EventAnalytics.abLift(
        Seq((1L, "c", true), (2L, "c", false)).toDF("u", "arm", "won"), "c")
    }
    intercept[IllegalArgumentException] { // null variant from a bad join
      EventAnalytics.powerAnalysis(
        Seq((1L, Some("c"), true), (2L, None, false)).toDF("u", "arm", "won"),
        "c")
    }
    intercept[IllegalArgumentException] { // empty assignment frame
      EventAnalytics.abLift(
        Seq.empty[(Long, String, Boolean)].toDF("u", "arm", "won"), "c")
    }
    // r16 advisor: a null `converted` must be a named error, not a silent
    // non-conversion — sum() skipping nulls would bias the readout with
    // no signal at all
    val nullConv = intercept[IllegalArgumentException] {
      EventAnalytics.abLift(
        Seq((1L, "c", Some(true)), (2L, "t", None), (3L, "t", Some(false)))
          .toDF("u", "arm", "won"), "c")
    }
    assert(nullConv.getMessage.contains("null or non-boolean converted"),
      nullConv.getMessage)
    // an unparseable string coerces to null through the boolean cast —
    // same named error, not a silent skip
    val badStr = intercept[IllegalArgumentException] {
      EventAnalytics.powerAnalysis(
        Seq((1L, "c", "yes!"), (2L, "t", "true")).toDF("u", "arm", "won"), "c")
    }
    assert(badStr.getMessage.contains("null or non-boolean converted"),
      badStr.getMessage)
  }

  test("cupedReadout: perfect correlation saturates; independence reads zero with ESS 1x") {
    import spark.implicits._
    val perfect = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0))
      .toDF("u", "pre", "post")
    val p = EventAnalytics.cupedReadout(perfect).head()
    assert(p.getLong(0) == 3L && p.getLong(1) == 1000000L, s"$p")
    assert(p.isNullAt(2), "ESS multiplier is null (infinite) at rho2 = 1")
    val indep = Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0), (4L, 1.0, 1.0))
      .toDF("u", "pre", "post")
    val i = EventAnalytics.cupedReadout(indep).head()
    assert(i.getLong(1) == 0L && i.getLong(2) == 1000000L,
      s"independent covariate must read rho2 = 0, ESS 1x: $i")
  }

  test("ltvCohort: cents credit to (cohort, age) cells with a running total") {
    import spark.implicits._
    def dayTs(d: Int): Timestamp = new Timestamp(d * 86400000L)
    val ev = Seq(
      (1L, dayTs(0), 1.0), (1L, dayTs(7), 2.0), // cohort w0: 100c then 200c
      (2L, dayTs(7), 3.0))                      // cohort w1: 300c
      .toDF("who", "at", "spend")
    val rows = EventAnalytics.ltvCohort(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 1L, 100L, 100L), (0L, 1L, 1L, 200L, 300L),
      (1L, 0L, 1L, 300L, 300L)), s"${rows.toSeq}")
  }

  test("alerting contracts fail loudly; empty frames flow through") {
    import spark.implicits._
    val three = Seq((1L, "a", ts(0))).toDF("a", "b", "c")
    intercept[IllegalArgumentException] {
      EventAnalytics.cepPairs(three, "a", "b", withinSeconds = 0L)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.cepSequence(three, Seq("a"))
    }
    intercept[IllegalArgumentException] { EventAnalytics.anomalyMad(three) }
    intercept[IllegalArgumentException] {
      EventAnalytics.cusumChangepoint(three.withColumn("d", col("a")), minN = 1)
    }
    intercept[IllegalArgumentException] {
      // non-integral key: the state row needs long ids
      EventAnalytics.pageHinkley(
        Seq((1L, "u", ts(0), 1.0)).toDF("a", "b", "c", "d"))
    }
    // decimal(<=18,0) ids — the JDBC NUMBER(n,0) shape — cast losslessly
    // to long and are ACCEPTED (r17 second review: the primitive-only
    // allowlist rejected what the old cast handled exactly); decimal
    // WITH scale or 19+ digits stays a named error (the cast can lose)
    assert(EventAnalytics.pageHinkley(
      Seq((1L, 2L, ts(0), 1.0)).toDF("a", "b", "c", "d")
        .selectExpr("cast(a as decimal(18,0)) a", "cast(b as decimal(10,0)) b", "c", "d"))
      .count() == 1L)
    intercept[IllegalArgumentException] {
      EventAnalytics.pageHinkley(
        Seq((1L, 2L, ts(0), 1.0)).toDF("a", "b", "c", "d")
          .selectExpr("cast(a as decimal(19,0)) a", "b", "c", "d"))
    }
    intercept[IllegalArgumentException] { EventAnalytics.scd2History(three) }
    val empty = Seq.empty[(Long, String, Timestamp)].toDF("a", "b", "c")
    assert(EventAnalytics.cepPairs(empty, "a", "b").count() == 0)
    assert(EventAnalytics.absence(empty, "a", "b").count() == 0)
    assert(EventAnalytics.cepSequence(empty, Seq("a", "b")).count() == 0)
    assert(EventAnalytics.anomalyMad(
      Seq.empty[(String, Double)].toDF("g", "v")).count() == 0)
    assert(EventAnalytics.cusumChangepoint(
      Seq.empty[(Long, Long, Timestamp, Double)].toDF("a", "b", "c", "d"))
      .count() == 0)
    assert(EventAnalytics.pageHinkley(
      Seq.empty[(Long, Long, Timestamp, Double)].toDF("a", "b", "c", "d"))
      .count() == 0)
    assert(EventAnalytics.scd2History(
      Seq.empty[(Long, Timestamp, Long, String)].toDF("a", "b", "c", "d"))
      .count() == 0)
  }
}
