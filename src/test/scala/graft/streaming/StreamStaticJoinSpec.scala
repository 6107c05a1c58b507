package graft.streaming

import graft.SparkTestBase

/** Stream-static join — the model-apply pattern: a micro-batch stream
  * enriched against a static (batch) relation, the streaming form of
  * broadcasting a trained model/dimension to every executor. (The
  * reference reaches the same shape by seeding a processor with
  * userConfig state; here the static side is just a DataFrame and
  * Catalyst re-plans it per batch.) */
class StreamStaticJoinSpec extends SparkTestBase {

  test("a stream enriches against a static dimension per micro-batch") {
    import spark.implicits._
    val dim = Seq((0, "even"), (1, "odd")).toDF("parity", "name")
    val in = GraftSource.memory[Int](spark)
    val enriched = in.toDS().toDF("v")
      .withColumn("parity", $"v" % 2)
      .join(dim, "parity")
      .select($"v", $"name")
    val q = enriched.writeStream.format("memory").queryName("ss_join").start()
    try {
      in.addData(1, 2, 3)
      q.processAllAvailable()
      in.addData(4, 5)
      q.processAllAvailable()
      val rows = spark.table("ss_join").as[(Int, String)].collect().toSet
      assert(rows === Set((1, "odd"), (2, "even"), (3, "odd"), (4, "even"), (5, "odd")))
    } finally q.stop()
  }
}
