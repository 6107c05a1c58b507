package graft.api

import graft.SparkTestBase

/** The public LM-scoring facade on user-supplied frames (arbitrary
  * column names, a corpus the fixture never shaped) with hand-computed
  * planted expectations — including a planted OOV continuation so the
  * backoff and unseen-bigram paths demonstrably fire. */
class LmScoringSpec extends SparkTestBase {

  private def micro(p: Double): Long =
    math.floor(math.log(p) * 1e6 + 0.5).toLong

  test("bigramScore: branching prefix yields exact scaled probabilities") {
    import spark.implicits._
    // model: "x y" seen 2x, "x z" 1x -> c_w1(x)=3; p(x y)=2/3, p(x z)=1/3
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "solo"))
      .toDF("my id", "my text")
    val rows = LmScoring.bigramScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // p_scaled(x y) = floor(2/3 * 1e8 + 0.5) = 66666667; avg_p = 0.666667
    // single-token doc 4 has no bigrams and is absent
    assert(rows.toSeq == Seq(
      (1L, 1L, 66666667L, 0.666667), (2L, 1L, 66666667L, 0.666667),
      (3L, 1L, 33333333L, 0.333333)), s"${rows.toSeq}")
  }

  test("backoffScore: seen bigram scores ln(1); planted OOV takes the 0.4 backoff") {
    import spark.implicits._
    val train = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("a", "b")
    val eval = Seq((3L, "the cat flew")).toDF("c", "d") // 'flew' is OOV
    val rows = LmScoring.backoffScore(train, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // (the cat): seen, ln(2/2) = 0. (cat flew): unseen; T=6 tokens, V=4
    // types, c_u(flew)=0 -> ln(0.4 * 1/10)
    val backoffTerm = micro(0.4 * 1.0 / 10.0)
    assert(rows.toSeq == Seq((3L, 2L, 1L, backoffTerm)), s"${rows.toSeq}")
  }

  test("kneserNeyScore: discounted seen mass + continuation smoothing, exactly") {
    import spark.implicits._
    val train = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("a", "b")
    val eval = Seq((3L, "the cat flew")).toDF("c", "d")
    val rows = LmScoring.kneserNeyScore(train, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // model types nt=3 {(the cat), (cat sat), (cat ran)}, vocab V=4
    // pfx: the -> c_w1=2, n1p=1; cat -> c_w1=2, n1p=2
    // ctx: cat completes 1 context; sat 1; ran 1; flew 0
    // (the cat): (2-0.75)/2 + 0.75*(1/2)*((1+1)/7)
    // (cat flew): prefix seen, bigram unseen: 0 + 0.75*(2/2)*((0+1)/7)
    val seen = micro((2.0 - 0.75) / 2.0 + 0.75 * (1.0 / 2.0) * (2.0 / 7.0))
    val unseen = micro(0.75 * (2.0 / 2.0) * (1.0 / 7.0))
    assert(rows.toSeq == Seq((3L, 2L, 1L, seen + unseen)), s"${rows.toSeq}")
  }

  test("perplexityYield: fluent docs land in the top decile, rare ones at the floor") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z")).toDF("i", "t")
    val rows = LmScoring.perplexityYield(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // scores: docs 1,2 = 66666667; doc 3 = 33333333; ranks 0,1,2 of n=3
    // -> deciles 0, 3, 6; score floors follow the ranking
    assert(rows.toSeq == Seq(
      (0L, 1L, 1L, 66666667L), (3L, 1L, 1L, 66666667L),
      (6L, 1L, 1L, 33333333L)), s"${rows.toSeq}")
  }

  test("input contracts fail loudly; degenerate inputs flow through") {
    import spark.implicits._
    val three = Seq((1L, "a", "b")).toDF("x", "y", "z")
    intercept[IllegalArgumentException] { LmScoring.bigramScore(three) }
    intercept[IllegalArgumentException] {
      LmScoring.backoffScore(three, Seq((1L, "a")).toDF("i", "t"))
    }
    intercept[IllegalArgumentException] {
      LmScoring.kneserNeyScore(Seq((1L, "a")).toDF("i", "t"), three)
    }
    intercept[IllegalArgumentException] { LmScoring.perplexityYield(three) }
    val empty = Seq.empty[(Long, String)].toDF("i", "t")
    assert(LmScoring.bigramScore(empty).count() == 0)
    assert(LmScoring.perplexityYield(empty).count() == 0)
    // an empty TRAIN corpus: every eval bigram backs off against T=V=0
    // … which would be ln of 1/0 — the eval-side guard is that a
    // single-token eval doc simply has no bigrams and yields no rows
    assert(LmScoring.backoffScore(
      Seq((1L, "a b")).toDF("i", "t"), Seq((2L, "solo")).toDF("i", "t"))
      .count() == 0)
  }
}
