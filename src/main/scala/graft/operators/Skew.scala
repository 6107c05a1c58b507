package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Skew-mitigation recipes (SURVEY §7.4-7). AQE's skew-join splitting is on
  * by default in Engine; this operator demonstrates the *manual* salting
  * rewrite for when a hot key would still overwhelm one reducer at 100 TB:
  * replicate the build side SALT times, scatter the probe side by a
  * deterministic per-row salt, join on (key, salt). The oracle is the PLAIN
  * join — proving the salted rewrite is semantics-preserving is exactly the
  * point of the query.
  */
object Skew {
  private val Salt = 8

  val saltedJoin = GraftQuery(
    "q28_salted_join",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
        .withColumn("salt", pmod(col("l_linenumber"), lit(Salt)))
      val o = Tables.t(s, dir, "orders")
        .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
      li.join(o, li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
            round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
            count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val all: Seq[GraftQuery] = Seq(saltedJoin)
}
