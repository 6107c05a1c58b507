package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Stream == batch for the KMV tracker: mergeability means the K-set after
  * ANY chopping is bit-identical to the batch K-set over the same keys,
  * and replays are no-ops. The estimate is cross-checked against both the
  * batch formula and the true distinct count's error band. */
class StreamingKmvSpec extends SparkTestBase {

  private def batchKset(keys: Seq[Long], k: Int): Seq[Long] = {
    import spark.implicits._
    keys.toDF("user_id").select(expr(
      """cast(conv(substring(md5(concat('kmv:', cast(user_id as string))),
         1, 12), 16, 10) as bigint)""").as("h"))
      .distinct().orderBy(col("h")).limit(k).as[Long].collect().toSeq
  }

  test("chopped stream converges to the batch K-set; replay is a no-op; estimate within band") {
    import spark.implicits._
    val keys = (1L to 3000L).map(i => i * 7919 % 10007) // dups included
    val nDistinct = keys.distinct.size
    val truth = batchKset(keys, 64)

    val tracker = new StreamingKmvTracker(spark, k = 64)
    val in = GraftSource.memory[Long](spark)
    val q = tracker.stream(in.toDS().toDF("user_id"))
    try {
      val chunks = Seq(keys.take(1), keys.slice(1, 1000), keys.drop(1000))
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      val (n, kth) = tracker.sketch
      assert(n == 64 && kth == truth.last,
        s"stream K-set kth $kth must equal batch ${truth.last}")

      // replay a whole chunk: sketch unchanged
      in.addData(chunks(1)); q.processAllAvailable()
      assert(tracker.sketch == ((64, truth.last)))

      // estimate within the KMV error band (~1/sqrt(K) = 12.5%; allow 3x)
      val est = tracker.estimate
      assert(math.abs(est - nDistinct) <= 0.375 * nDistinct,
        s"estimate $est vs true $nDistinct")
    } finally q.stop()
  }

  test("order-insensitivity: reversed feed in 7 chunks yields the identical sketch") {
    val keys = (1L to 2000L).map(i => i * 104729 % 4999)
    val t1 = new StreamingKmvTracker(spark, k = 64)
    import spark.implicits._
    t1.update(keys.toDF("user_id"))
    val t2 = new StreamingKmvTracker(spark, k = 64)
    keys.reverse.grouped(300).foreach(c => t2.update(c.toDF("user_id")))
    assert(t1.sketch == t2.sketch && t1.estimate == t2.estimate)
  }

  test("per-batch fold is exchange-free: no shuffle, no global sort in the update plan") {
    import spark.implicits._
    val keys = (1L to 5000L).map(i => i * 7919 % 10007)
    val df = keys.toDF("user_id").repartition(8)
    // mirror the tracker's internal plan shape and assert it never exchanges
    val plan = df.select(col(df.columns.head).cast("string").as("key"))
      .select(conv(substring(md5(concat(lit("kmv:"), col("key"))
        .cast("binary")), 1, 12), 16, 10).cast("long").as("h"))
      .as[Long]
      .mapPartitions(it => it.take(64))
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty, s"KMV fold must not exchange:\n$plan")

    // and the tracker over the same 8-partition frame still matches batch
    val t = new StreamingKmvTracker(spark, k = 64)
    t.update(df)
    val truth = batchKset(keys, 64)
    assert(t.sketch == ((truth.length, truth.last)))
  }

  test("column names needing backticks (spaces, dots) are handled positionally") {
    import spark.implicits._
    val keys = (1L to 500L).map(i => i * 31 % 977)
    val truth = batchKset(keys, 64)
    val t = new StreamingKmvTracker(spark, k = 64)
    t.update(keys.toDF("user id.with dots-and-hyphens"))
    assert(t.sketch == ((truth.length, truth.last)))
  }

  test("multi-column micro-batches hash the FIRST column; extras are ignored") {
    // r14 regression: toDF("key") threw for any batch wider than one
    // column — the fold must stay purely positional on column 1
    import spark.implicits._
    val keys = (1L to 500L).map(i => i * 31 % 977)
    val truth = batchKset(keys, 64)
    val t = new StreamingKmvTracker(spark, k = 64)
    t.update(keys.map(k => (k, s"payload-$k", k % 7))
      .toDF("the.key", "payload col", "extra"))
    assert(t.sketch == ((truth.length, truth.last)))
  }
}
