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
