package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The public text facade must work on user-supplied (id, text) frames
  * (arbitrary column names, documents the fixture never shaped) with
  * hand-computed planted expectations — the "switch to this library"
  * contract, exercised end to end per function. */
class TextAnalyticsSpec extends SparkTestBase {

  test("qualityScores: hand-computed composite on a user frame") {
    import spark.implicits._
    val df = Seq((10L, "the cat sat on the mat")).toDF("my_id", "body")
    val r = TextAnalytics.qualityScores(df).collect().head
    assert(r.getAs[Int]("n_tokens") == 6 && r.getAs[Int]("n_uniq") == 5 &&
      r.getAs[Int]("n_stop") == 2)
    assert(r.getAs[Double]("ttr") == 0.833333 &&
      r.getAs[Double]("stop_ratio") == 0.333333)
    assert(r.getAs[Double]("score") == 0.033333 &&
      r.getAs[String]("bucket") == "low")
  }

  test("gopherFlags: a 64-word stopword-rich doc passes all rules; a 3-word doc fails") {
    import spark.implicits._
    val good = Array.fill(8)("the be to of and that have with").mkString(" ")
    val df = Seq((1L, good), (2L, "too short doc")).toDF("id", "txt")
    val m = TextAnalytics.gopherFlags(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("r_all"),
      s"64 words, mean len 3.0, all alpha, 8 stop kinds must pass: ${m(1L)}")
    assert(!m(2L).getAs[Boolean]("r_words") && !m(2L).getAs[Boolean]("r_all"))
  }

  test("languageId: marker argmax with the fixed tie order") {
    import spark.implicits._
    val df = Seq(
      (1L, "der die das etwas"),
      (2L, "le la les mots"),
      (3L, "the a of words"),
      (4L, "no markers here")).toDF("k", "v") // all-zero scores tie to en
    val pred = TextAnalytics.languageId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "de", 2L -> "fr", 3L -> "en", 4L -> "en"), s"$pred")
  }

  test("tokenCounts: whitespace vs BPE-ish regex vs chars") {
    import spark.implicits._
    val df = Seq((7L, "ab 12 c!d")).toDF("id", "t")
    val r = TextAnalytics.tokenCounts(df).collect().head
    // regex segments: ab | 12 | c | ! | d
    assert(r.getInt(1) == 3 && r.getInt(2) == 5 && r.getInt(3) == 9, s"$r")
  }

  test("chunk: window 3 stride 2 over a 7-token doc — 4 chunks, exact spans") {
    import spark.implicits._
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("id", "text")
    val rows = TextAnalytics.chunk(df, window = 3, stride = 2)
      .orderBy(col("chunk_idx"))
      .select(col("chunk_idx"), col("tok_start"), col("tok_len"), col("chunk"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (0, 0, 3, "t1 t2 t3"), (1, 2, 3, "t3 t4 t5"),
      (2, 4, 3, "t5 t6 t7"), (3, 6, 1, "t7")), s"${rows.toSeq}")
    intercept[IllegalArgumentException] {
      TextAnalytics.chunk(df, window = 2, stride = 3) // stride > window
    }
  }

  test("bpeTrain + bpeTokenCounts: hand-traced merges on a planted corpus") {
    import spark.implicits._
    val df = Seq((1L, "aaab aaab"), (2L, "aaab xy")).toDF("id", "text")
    // freq: aaab=3, xy=1. round1 (a,a) cnt 6; round2 tie (a,b) vs (aa,a) ->
    // lexicographic (a,b) cnt 3; round3 (aa,ab) cnt 3; round4 (x,y) cnt 1;
    // round5 exhausted
    val merges = TextAnalytics.bpeTrain(df, rounds = 5)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "a", "a", 6L), (2, "a", "b", 3L), (3, "aa", "ab", 3L),
      (4, "x", "y", 1L)), s"${merges.toSeq}")

    val counts = TextAnalytics.bpeTokenCounts(df, rounds = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every word collapses to a single trained token
    assert(counts == Map(1L -> ((2L, 2L)), 2L -> ((2L, 2L))), s"$counts")
  }

  test("input contract: a non-two-column frame fails loudly") {
    import spark.implicits._
    val bad = Seq((1L, "x", "extra")).toDF("a", "b", "c")
    intercept[IllegalArgumentException] { TextAnalytics.qualityScores(bad) }
  }

  test("piiScrub finds and redacts planted emails and IPs, leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      1L -> "write to alice.smith+spam@mail.example.org today",
      2L -> "server at 192.168.1.17 and 10.0.0.1 replied",
      3L -> "no sensitive content here at all",
      4L -> "mixed: bob@x.io from 127.0.0.1").toDF("id", "body")
    val r = TextAnalytics.piiScrub(df)
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getString(3)))).toMap
    assert(r(1L)._1 == 1 && r(1L)._2 == 0)
    assert(r(1L)._3 == "write to <EMAIL> today", r(1L)._3)
    assert(r(2L) == ((0, 2, "server at <IP> and <IP> replied")))
    assert(r(3L) == ((0, 0, "no sensitive content here at all")))
    assert(r(4L) == ((1, 1, "mixed: <EMAIL> from <IP>")))
  }

  test("piiScrub: detection and redaction agree on lookalike non-PII (literal dots)") {
    import spark.implicits._
    // the r15 regression: an expr()-embedded pattern lost its \. escapes
    // (unescapeSQLString) and COUNTED these as PII while the redactor
    // (literal \.) left the text alone — counts and scrubbed text must
    // come from the identical automaton
    val df = Seq(
      1L -> "build 1.2.3 4 finished",   // digit runs, spaces not dots
      2L -> "mail user@hostname today", // no TLD dot
      3L -> "real a@b.co and 10.0.0.1").toDF("id", "body")
    val r = TextAnalytics.piiScrub(df)
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getString(3)))).toMap
    assert(r(1L) == ((0, 0, "build 1.2.3 4 finished")), s"${r(1L)}")
    assert(r(2L) == ((0, 0, "mail user@hostname today")), s"${r(2L)}")
    assert(r(3L) == ((1, 1, "real <EMAIL> and <IP>")), s"${r(3L)}")
  }

  test("fingerprint + normalize: whitespace/case variants collapse; originals differ") {
    import spark.implicits._
    val df = Seq(
      1L -> "Hello   World", 2L -> "hello world ", 3L -> "other text!")
      .toDF("id", "body")
    val fps = TextAnalytics.fingerprint(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L), "case/space variants share a fingerprint")
    assert(fps(1L) != fps(3L))
    val norm = TextAnalytics.normalize(df)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(norm(1L) == (("hello world", 11)) && norm(2L) == (("hello world", 11)),
      s"$norm")
    assert(norm(3L) == (("other text", 10)), "punctuation stripped")
  }

  test("collocations: the planted phrase tops PMI; hapax pairs are floored out") {
    import spark.implicits._
    // "new york" co-occurs always together (high PMI); "of the" is
    // frequent but independent (low PMI); "rare pair" appears once and
    // must be excluded by minCount
    val docs = (1 to 6).map(i =>
      (i.toLong, "new york " + ("of x the y " * 4).trim)) :+
      ((7L, "rare pair of the"))
    val rows = TextAnalytics.collocations(docs.toDF("id", "body"),
        minCount = 5, topN = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.head._1 == "new york" && rows.head._2 == 6L, s"${rows.toSeq}")
    assert(!rows.exists(_._1 == "rare pair"), "hapax pairs must be floored out")
    intercept[IllegalArgumentException] {
      TextAnalytics.collocations(docs.toDF("id", "body"), minCount = 0)
    }
  }

  test("rakeKeywords: multi-word phrases outrank bare frequent words; custom stop set respected") {
    import spark.implicits._
    // "machine learning" is a 2-word phrase (each word deg 2, freq 1 ->
    // wscore 2e6 each -> phrase 4e6); "data" always rides alone (1e6)
    val docs = Seq(
      (1L, "machine learning is the data"),
      (2L, "machine learning of data"),
      (3L, "data is the data")).toDF("id", "body")
    val rows = TextAnalytics.rakeKeywords(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.head._1 == "machine learning" && rows.head._2 == 2L,
      s"${rows.toSeq}")
    val ml = rows.find(_._1 == "machine learning").get
    val d = rows.find(_._1 == "data").get
    assert(ml._3 > d._3, s"phrase must outrank bare word: ${rows.toSeq}")
    // a custom stop set changes the phrase segmentation
    val custom = TextAnalytics.rakeKeywords(docs, stopwords = Seq("data"))
      .collect().map(_.getString(0))
    assert(custom.exists(_.contains("is the")),
      s"with only 'data' stopped, 'is'/'the' join phrases: ${custom.toSeq}")
    intercept[IllegalArgumentException] {
      TextAnalytics.rakeKeywords(docs, stopwords = Seq.empty)
    }
  }
}
