package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Detection-power pins for ev_value_psi (the oracle pins exactness; this
  * pins that the statistic MEANS what monitoring dashboards assume) and
  * shape invariants for ev_survival_curve. */
class PsiPropertySpec extends SparkTestBase {
  import org.apache.spark.sql.DataFrame

  private def tagged(base: Seq[Long], cur: Seq[Long]): DataFrame = {
    import spark.implicits._
    (base.map((_, true)) ++ cur.map((_, false))).toDF("cents", "is_base")
  }

  private def total(df: DataFrame): Long =
    df.filter(col("bucket") === -1L).collect()(0).getAs[Long]("psi_term_micro")

  test("identical slices score ~0; a planted shift crosses the 0.25 alarm") {
    val rng = new scala.util.Random(11)
    val base = Seq.fill(4000)((rng.nextGaussian() * 200 + 1000).toLong.max(0L))
    // same generator, fresh draw: sampling noise only -> 'stable' (< 0.1)
    val same = Seq.fill(4000)((rng.nextGaussian() * 200 + 1000).toLong.max(0L))
    val stable = total(EventOps.psiTable(spark, tagged(base, same)))
    assert(stable >= 0 && stable < 100000L,
      s"same-distribution PSI must sit under the 0.1 stable line, got $stable")
    // mean shifted by 2.5 sigma: the population moved -> alarm (> 0.25)
    val shifted = Seq.fill(4000)((rng.nextGaussian() * 200 + 1500).toLong.max(0L))
    val alarm = total(EventOps.psiTable(spark, tagged(base, shifted)))
    assert(alarm > 250000L,
      s"a 2.5-sigma mean shift must cross the 0.25 PSI alarm, got $alarm")
    // PSI is directional but its alarm is symmetric: swapping slices must
    // still alarm (terms negate pairwise only in p-q, not in the product)
    val alarmRev = total(EventOps.psiTable(spark, tagged(shifted, base)))
    assert(alarmRev > 250000L, s"reversed shift must also alarm, got $alarmRev")
  }

  test("survival curve: starts at 100%, never increases, counts never rise") {
    import spark.implicits._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = graft.SparkEntry.queries("ev_survival_curve")(spark, d)
        .select(col("t_days"), col("n_surviving"), col("survival_micro"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(rows.nonEmpty && rows.head._1 == 0L)
      assert(rows.head._3 == 1000000L,
        s"$d: every user survives to its own first day (t=0 must be 1e6)")
      rows.sliding(2).foreach { case Array((_, n1, s1), (t, n2, s2)) =>
        assert(n2 <= n1 && s2 <= s1,
          s"$d: survival must be non-increasing, violated at t=$t")
      case _ => ()
      }
    }
  }
}
