package graft.functions

import graft.streaming.GMonoid
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005): a fixed-size frequency
  * summary supporting point estimates with the one-sided guarantee
  * `exact <= estimate <= exact + (e/width) * N` (w.p. 1 - exp(-depth)).
  *
  * This is the "novel sketch as a custom aggregate" surface the engine
  * exposes beyond built-ins (HLL is approx_count_distinct, quantiles are
  * approx_percentile; Spark has no mergeable frequency sketch in the
  * DataFrame API). It is implemented the house way: a [[GMonoid]] — the
  * reference's state algebra (Monoid.scala:17-24) — lifted into a typed
  * `Aggregator`, which lowers to partial (map-side) + merge (reduce-side)
  * aggregation. At 100 TB each executor folds its partitions into one
  * depth x width table and the shuffle moves ONLY the tables (a few KB
  * each), never token rows — the exact shape that makes corpus-wide
  * frequency summaries cheap at cluster scale.
  *
  * Determinism: hashes are MurmurHash3 of the key with fixed seeds
  * (pure function of the bytes — stable across JVMs, shards, engines), and
  * the estimate is reproducible because add/merge are commutative integer
  * sums. Row i's column is the classic double-hashing (h1 + i*h2) mod w.
  */
final case class CMSketch(depth: Int, width: Int, n: Long, counts: Array[Long]) {
  import scala.util.hashing.MurmurHash3

  private def col(key: String, row: Int): Int = {
    val h1 = MurmurHash3.stringHash(key, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(key, 0x85ebca6b) | 1 // odd => full period
    val c = (h1 + row * h2) % width
    if (c < 0) c + width else c
  }

  /** In-place add (the aggregation buffer is owned by the caller). */
  def add(key: String, cnt: Long = 1L): CMSketch = {
    var i = 0
    while (i < depth) { counts(i * width + col(key, i)) += cnt; i += 1 }
    copy(n = n + cnt)
  }

  def merge(o: CMSketch): CMSketch = {
    require(o.depth == depth && o.width == width, "incompatible sketch shape")
    val out = new Array[Long](counts.length)
    var i = 0
    while (i < counts.length) { out(i) = counts(i) + o.counts(i); i += 1 }
    CMSketch(depth, width, n + o.n, out)
  }

  /** Point estimate: min over rows — never under-counts. */
  def estimate(key: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = counts(i * width + col(key, i))
      if (v < best) best = v
      i += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  /** The additive error ceiling `(e/width) * N` of the CMS guarantee. */
  def errorBound: Long = math.ceil(math.E / width * n).toLong
}

object CMSketch {
  def empty(depth: Int = 4, width: Int = 1024): CMSketch =
    CMSketch(depth, width, 0L, new Array[Long](depth * width))

  /** The sketch is a monoid (associative merge, empty identity) — the same
    * algebra the reference requires of managed state. */
  def monoid(depth: Int, width: Int): GMonoid[CMSketch] = new GMonoid[CMSketch] {
    def zero: CMSketch = empty(depth, width)
    def plus(a: CMSketch, b: CMSketch): CMSketch = a.merge(b)
  }

  /** Typed Aggregator over a string column: map-side partial sketches,
    * reduce-side merge. Usable in batch (`ds.select(agg.toColumn)`) and
    * streaming (`groupByKey(...).agg(...)`) alike. */
  def agg(depth: Int = 4, width: Int = 1024): Aggregator[String, CMSketch, CMSketch] =
    new Aggregator[String, CMSketch, CMSketch] {
      override def zero: CMSketch = empty(depth, width)
      override def reduce(b: CMSketch, a: String): CMSketch = b.add(a)
      override def merge(b1: CMSketch, b2: CMSketch): CMSketch = b1.merge(b2)
      override def finish(r: CMSketch): CMSketch = r
      override def bufferEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
      override def outputEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
    }
}
