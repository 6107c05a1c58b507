package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the engine's answer to the reference's
  * CoLocationPartitioner (reference: streaming/src/main/scala/io/gearpump/streaming/partitioner/CoLocationPartitioner.scala:23-26)
  * at rest: two tables bucketed by the join key on the same bucket count
  * join with ZERO shuffle exchanges. At 100 TB this is the difference
  * between a full-network fact-table shuffle per join and a narrow
  * bucket-local merge — the layout you pick once at ingest and amortize
  * over every downstream join. */
class BucketedJoinSpec extends SparkTestBase {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE final plan
    // AQE wraps exchanges in QueryStageExec whose children is Nil — recurse
    // through .plan or the count silently reads 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case s: ShuffleExchangeExec => 1 + s.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("bucketed tables join without any shuffle exchange") {
    // default warehouse dir (spark-warehouse/, gitignored); tables dropped below
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
      val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      // bucketed join: no exchange for the join itself, and the groupBy on
      // the bucket key rides the same distribution -> zero shuffles total
      assert(shuffleCount(joined) === 0,
        s"expected fully co-located plan, got:\n${joined.queryExecution.executedPlan}")

      // same join over the raw (unbucketed) parquet shuffles both sides
      val raw = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      assert(shuffleCount(raw) >= 2, "control: unbucketed join should shuffle")

      // and the results agree
      val a = joined.orderBy("o_orderkey").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val b = raw.orderBy("o_orderkey").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(a.sameElements(b))
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
