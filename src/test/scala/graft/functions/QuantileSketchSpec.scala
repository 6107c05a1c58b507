package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.util.Random

/** Correctness pin for the mergeable quantile sketch and its rows-only
  * registry entry ev_value_quantile_sketch: bucket round-trips, the
  * ≤ 1/16-relative quantile bound vs exact order statistics, exact
  * merge associativity, and streaming-fold == batch parity. */
class QuantileSketchSpec extends SparkTestBase {
  import QuantileSketch._

  test("bucket edges bracket every in-window value exactly") {
    val rng = new Random(3)
    val vals = Seq.fill(2000)(math.exp(rng.nextGaussian() * 4)) ++
      Seq(1e-10, 0.5, 1.0, 1.0001, 15.99, 16.0, 1e12)
    for (v <- vals) {
      val b = bucketOf(v)
      assert(lowerEdge(b) <= v, s"$v below its bucket edge ${lowerEdge(b)}")
      if (b + 1 < Buckets)
        assert(v < lowerEdge(b + 1) || lowerEdge(b + 1) == 0.0,
          s"$v not under next edge ${lowerEdge(b + 1)}")
      // edges are exact fixed points of their own bucket
      assert(bucketOf(lowerEdge(b)) == b || b == 0)
    }
    // zero/negative/NaN all land in bucket 0, never throw
    assert(bucketOf(0.0) == 0 && bucketOf(-3.2) == 0 && bucketOf(Double.NaN) == 0)
  }

  test("quantiles sit within one sub-bucket below the exact order statistic") {
    val rng = new Random(17)
    val vals = Array.fill(50000)(math.exp(rng.nextGaussian() * 2) * 100)
    val sk = vals.foldLeft(QuantileSketch.empty)((s, v) => s.add(v))
    val sorted = vals.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
      val exact = sorted(math.max(0, math.ceil(q * vals.length).toInt - 1))
      val est = sk.quantile(q)
      assert(est <= exact, s"q=$q lower edge $est above exact $exact")
      assert(exact <= est * (1.0 + 1.0 / Sub) * (1 + 1e-12),
        s"q=$q exact $exact beyond the 1/$Sub bound above $est")
    }
  }

  test("merge is exact: chunked fold equals whole fold, in any order") {
    val rng = new Random(23)
    val vals = Seq.fill(5000)(rng.nextDouble() * 1e6)
    val whole = vals.foldLeft(QuantileSketch.empty)((s, v) => s.add(v))
    val chunks = vals.grouped(617).map(_.foldLeft(QuantileSketch.empty)((s, v) => s.add(v))).toSeq
    val merged = rng.shuffle(chunks).reduce(_ merge _)
    assert(merged.n == whole.n)
    assert(merged.counts.toSeq == whole.counts.toSeq, "merge must be bit-exact")
  }

  test("streaming fold equals the batch sketch under chopping") {
    import spark.implicits._
    val rng = new Random(31)
    val vals = Seq.fill(4000)(math.abs(rng.nextGaussian()) * 250 + 0.01)
    val batch = vals.foldLeft(QuantileSketch.empty)((s, v) => s.add(v))

    val in = graft.streaming.GraftSource.memory[Double](spark)
    val q = in.toDS().groupByKey(_ => 0)
      .agg(QuantileSketch.agg.toColumn.name("sk"))
      .writeStream.outputMode("update").format("memory").queryName("qsk").start()
    try {
      var rest = vals
      while (rest.nonEmpty) {
        val k = 1 + rng.nextInt(700)
        in.addData(rest.take(k))
        rest = rest.drop(k)
        q.processAllAvailable()
      }
      val got = spark.table("qsk").as[(Int, QSketch)].collect()
        .maxBy(_._2.n)._2
      assert(got.n == batch.n)
      assert(got.counts.toSeq == batch.counts.toSeq,
        "streaming fold must equal the batch sketch bit-exactly")
    } finally q.stop()
  }

  test("ev_value_quantile_sketch: registry row within bound of exact percentiles") {
    import spark.implicits._
    val row = graft.SparkEntry.queries("ev_value_quantile_sketch")(spark, sf)
      .as[(Long, Double, Double, Double)].head()
    val vals = graft.Tables.t(spark, sf, "events")
      .select(col("value").cast("double")).as[Double].collect().sorted
    assert(row._1 == vals.length)
    for ((q, est) <- Seq((0.5, row._2), (0.9, row._3), (0.99, row._4))) {
      val exact = vals(math.max(0, math.ceil(q * vals.length).toInt - 1))
      assert(est <= exact && exact <= est * (1.0 + 1.0 / Sub) * (1 + 1e-12),
        s"registry q=$q est $est vs exact $exact")
    }
  }
}
