package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** End-to-end streaming wordcount — the reference's flagship example
  * (examples/streaming/wordcount: Split -> GroupByPartitioner -> Sum) as
  * MemoryStream -> explode(split) -> groupBy.count in update mode. */
class StreamingWordCountSpec extends SparkTestBase {

  test("streaming wordcount matches hand-counted totals across batches") {
    import spark.implicits._
    val in = GraftSource.memory[String](spark)
    val counts = in.toDS().toDF("line")
      .select(explode(split(col("line"), " ")).as("word"))
      .groupBy("word").count()
    val q = counts.writeStream
      .outputMode("update").format("memory").queryName("wc_out").start()
    try {
      in.addData("the quick brown fox", "the lazy dog")
      q.processAllAvailable()
      in.addData("the end")
      q.processAllAvailable()
      val result = spark.table("wc_out")
        .groupBy("word").agg(max("count").as("count")) // update mode re-emits
        .as[(String, Long)].collect().toMap
      val expected = "the quick brown fox the lazy dog the end"
        .split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(result === expected)
      assert(result("the") === 3L)
    } finally q.stop()
  }

  test("stream-static join: streaming events enrich against a static dim") {
    import spark.implicits._
    val in = GraftSource.memory[Int](spark)
    val dim = Seq((1, "one"), (2, "two"), (3, "three")).toDF("id", "name")
    val joined = in.toDS().toDF("id").join(dim, "id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      in.addData(1, 3, 5)
      q.processAllAvailable()
      val got = spark.table("ss_join").as[(Int, String)].collect().sorted
      assert(got === Array((1, "one"), (3, "three")))
    } finally q.stop()
  }
}
