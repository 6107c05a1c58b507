package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the Count-Min sketch's algebra and its one-sided error guarantee —
  * the properties that make it safe to run as a distributed partial
  * aggregate over a 100 TB corpus. */
class CountMinSketchSpec extends SparkTestBase {
  import scala.util.Random

  private def localSketch(keys: Seq[String]): CMSketch =
    keys.foldLeft(CMSketch.empty()) { (s, k) => s.add(k) }

  test("monoid laws: empty identity and associativity of merge") {
    val rnd = new Random(7)
    val keys = Seq.fill(500)(s"tok${rnd.nextInt(40)}")
    val (a, b, c) = (localSketch(keys.take(100)),
      localSketch(keys.slice(100, 300)), localSketch(keys.drop(300)))
    val whole = localSketch(keys)
    assert(CMSketch.empty().merge(a).counts.sameElements(a.counts))
    assert(a.merge(CMSketch.empty()).counts.sameElements(a.counts))
    val left = a.merge(b).merge(c)
    val right = a.merge(b.merge(c))
    assert(left.counts.sameElements(right.counts) && left.n == right.n)
    assert(left.counts.sameElements(whole.counts) && left.n == whole.n,
      "split-and-merge must equal the single-pass sketch")
  }

  test("distributed aggregation equals the local fold, shard layout irrelevant") {
    import spark.implicits._
    val toks = graft.Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).as[String]
    val distributed = toks.repartition(8)
      .select(CMSketch.agg().toColumn).head()
    val local = localSketch(toks.collect().toSeq)
    assert(distributed.n == local.n)
    assert(distributed.counts.sameElements(local.counts),
      "map-side partials + merge must reproduce the sequential sketch exactly")
  }

  test("CMS as streaming state: one sketch accumulates exactly across micro-batches") {
    import spark.implicits._
    val in = graft.streaming.GraftSource.memory[String](spark)
    val sketches = in.toDS().flatMap(_.split(" "))
      .groupByKey(_ => 0)
      .agg(CMSketch.agg(4, 256).toColumn.name("sk"))
    val q = sketches.writeStream
      .outputMode("update").format("memory").queryName("cms_stream").start()
    try {
      in.addData("a b a", "c a")
      q.processAllAvailable()
      in.addData("a d b")
      q.processAllAvailable()
      val sk = spark.table("cms_stream").as[(Int, CMSketch)]
        .collect().map(_._2).maxBy(_.n) // update mode re-emits; last has all
      assert(sk.n === 8)
      // four distinct keys in a 4x256 sketch: estimates are exact unless a
      // key collides in EVERY row — not possible with this fixed hash family
      assert(sk.estimate("a") === 4 && sk.estimate("b") === 2 &&
        sk.estimate("c") === 1 && sk.estimate("d") === 1)
    } finally q.stop()
  }

  test("estimates never under-count and respect the (e/width)*N ceiling") {
    import spark.implicits._
    val toks = graft.Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).as[String]
    val sk = toks.select(CMSketch.agg().toColumn).head()
    val exact = toks.groupBy("tok").count().as[(String, Long)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (tok, ex) =>
      val est = sk.estimate(tok)
      assert(est >= ex, s"CMS under-counted '$tok': $est < $ex")
      assert(est <= ex + sk.errorBound,
        s"'$tok' estimate $est exceeds exact $ex + bound ${sk.errorBound}")
    }
    assert(sk.estimate("never-seen-token-xyzzy") <= sk.errorBound)
  }
}
