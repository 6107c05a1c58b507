package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation recipes (SURVEY §7.4-7). AQE's skew-join splitting is on
  * by default in Engine; this operator demonstrates the *manual* salting
  * rewrite for when a hot key would still overwhelm one reducer at 100 TB:
  * replicate the build side SALT times, scatter the probe side by a
  * deterministic per-row salt, join on (key, salt). The oracle is the PLAIN
  * join — proving the salted rewrite is semantics-preserving is exactly the
  * point of the query. ScaleStressSpec measures the payoff: on a corpus
  * with a planted hub order key, [[saltedRevenue]] vs [[plainRevenue]] with
  * AQE skew-splitting disabled (the single-reducer fate salting exists to
  * avoid), ratio logged in README "Scale stress".
  */
object Skew {
  private[graft] val Salt = 8

  private def revenueAgg(joined: DataFrame): DataFrame =
    joined.groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))

  /** The manual salting rewrite over arbitrary lineitem/orders frames —
    * the exact plan q28 registers, factored so the scale-stress harness
    * times THIS code path (not a re-spelling) against [[plainRevenue]]. */
  private[graft] def saltedRevenue(li0: DataFrame, o0: DataFrame): DataFrame = {
    val li = li0.withColumn("salt", pmod(col("l_linenumber"), lit(Salt)))
    val o = o0.withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    revenueAgg(li.join(o,
      li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt")))
  }

  /** The naive equi-join with the same aggregate — the semantics oracle
    * and the single-reducer baseline the salted rewrite is measured
    * against. */
  private[graft] def plainRevenue(li: DataFrame, o: DataFrame): DataFrame =
    revenueAgg(li.join(o, li("l_orderkey") === o("o_orderkey")))

  val saltedJoin = GraftQuery(
    "q28_salted_join",
    (s, dir) => saltedRevenue(
      Tables.t(s, dir, "lineitem"), Tables.t(s, dir, "orders")),
    Some("""SELECT o_orderpriority,
            round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
            count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val all: Seq[GraftQuery] = Seq(saltedJoin)
}
