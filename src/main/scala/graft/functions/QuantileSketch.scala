package graft.functions

import graft.streaming.GMonoid
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MERGEABLE QUANTILE SKETCH: an HDR-histogram-style log₂-bucketed summary
  * for non-negative doubles — the third classic sketch next to Count-Min
  * (frequencies) and HLL (distincts), and the one that makes percentile
  * monitoring cheap over streams: Spark's percentile_approx cannot run
  * inside arbitrary stateful streaming folds, while this buffer is a plain
  * long vector with commutative merge.
  *
  * Bucketing is EXACT BIT ARITHMETIC, no transcendental math: a double's
  * bucket is (IEEE exponent, top-4 mantissa bits) pulled straight from
  * `doubleToLongBits` — 16 sub-buckets per octave, so any quantile's
  * reported bucket lower edge is within one sub-bucket (≤ 1/16 ≈ 6.25%
  * relative) of the true value. Pure function of the bits: identical on
  * every JVM, shard, and arrival order (add/merge are commutative integer
  * sums — the GMonoid contract the reference requires of managed state).
  *
  * At 100 TB each executor folds its partitions into ONE 2048-slot vector
  * and the shuffle moves only vectors (16 KB), never value rows. */
final case class QSketch(n: Long, counts: Array[Long]) {
  import QuantileSketch._

  /** DESTRUCTIVE, buffer-owned add: mutates this sketch's `counts` array
    * in place and returns a copy that SHARES it (only `n` is fresh). A
    * caller that retains the pre-add reference observes the mutated counts
    * with a stale `n` — by design for the Aggregator hot loop, where the
    * buffer has a single owner and add allocates nothing. Treat the input
    * as consumed; use [[merge]] (which allocates) for value semantics. */
  def add(v: Double): QSketch = {
    counts(bucketOf(v)) += 1
    copy(n = n + 1)
  }

  def merge(o: QSketch): QSketch = {
    val out = new Array[Long](Buckets)
    var i = 0
    while (i < Buckets) { out(i) = counts(i) + o.counts(i); i += 1 }
    QSketch(n + o.n, out)
  }

  /** Quantile estimate: the LOWER EDGE of the bucket holding rank
    * ceil(q·n) — within one sub-bucket (≤6.25% relative) below the true
    * order statistic for values inside the [2^-64, 2^64) bucket window;
    * values below the window (incl. 0 and subnormals) collapse to bucket
    * 0, whose reported lower edge is 0.0. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0,1]")
    if (n == 0) return 0.0
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var seen = 0L
    var i = 0
    while (i < Buckets) {
      seen += counts(i)
      if (seen >= rank) return lowerEdge(i)
      i += 1
    }
    lowerEdge(Buckets - 1)
  }
}

object QuantileSketch {
  /** 128 octaves x 16 sub-buckets: one octave per binary exponent over
    * raw IEEE exponents [1023-64, 1023+64) — i.e. values in [2^-64, 2^64)
    * — sub-bucketed by the top 4 mantissa bits, so each bucket spans a
    * factor of exactly (1 + 1/16) and the quantile's reported lower edge
    * is within 6.25% relative of the true order statistic. Everything
    * below the window (incl. 0 and subnormals) lands in bucket 0;
    * everything at/above it clamps to the last bucket. 2048 longs = 16 KB
    * per buffer. */
  val SubBits = 4
  val Sub: Int = 1 << SubBits // 16 sub-buckets per octave
  val Octaves = 128
  val Buckets: Int = Octaves * Sub
  private val ExpLo = 1023 - 64 // raw-exponent window start

  def bucketOf(v: Double): Int = {
    if (!(v > 0.0) || v.isNaN) return 0 // 0, negatives, NaN -> bucket 0
    val bits = java.lang.Double.doubleToLongBits(v)
    val rawExp = ((bits >>> 52) & 0x7FF).toInt
    if (rawExp == 0) return 0 // subnormal
    val oct = rawExp - ExpLo
    if (oct < 0) return 0
    if (oct >= Octaves) return Buckets - 1
    val sub = ((bits >>> (52 - SubBits)) & (Sub - 1)).toInt // top 4 mantissa bits
    oct * Sub + sub
  }

  /** Exact lower edge of a bucket, reconstructed from its bits. */
  def lowerEdge(b: Int): Double = {
    if (b <= 0) return 0.0
    val oct = b / Sub
    val sub = (b % Sub).toLong
    val rawExp = (ExpLo + oct).toLong
    java.lang.Double.longBitsToDouble((rawExp << 52) | (sub << (52 - SubBits)))
  }

  def empty: QSketch = QSketch(0L, new Array[Long](Buckets))

  /** The sketch is a monoid — the reference's managed-state algebra. */
  val monoid: GMonoid[QSketch] = new GMonoid[QSketch] {
    def zero: QSketch = empty
    def plus(a: QSketch, b: QSketch): QSketch = a.merge(b)
  }

  /** Typed Aggregator over a double column: map-side partial sketches,
    * reduce-side merge. Usable in batch (`ds.select(agg.toColumn)`) and
    * streaming stateful folds alike. */
  def agg: Aggregator[Double, QSketch, QSketch] =
    new Aggregator[Double, QSketch, QSketch] {
      override def zero: QSketch = empty
      override def reduce(b: QSketch, a: Double): QSketch = b.add(a)
      override def merge(b1: QSketch, b2: QSketch): QSketch = b1.merge(b2)
      override def finish(r: QSketch): QSketch = r
      override def bufferEncoder: Encoder[QSketch] = Encoders.product[QSketch]
      override def outputEncoder: Encoder[QSketch] = Encoders.product[QSketch]
    }
}
