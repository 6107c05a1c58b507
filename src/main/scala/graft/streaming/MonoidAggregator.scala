package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Monoid-based aggregation — parity with the reference's state API, where
  * every managed aggregate is an associative `Monoid.plus` with a `zero`
  * (reference: streaming/src/main/scala/io/gearpump/streaming/state/api/Monoid.scala:17-24,
  * MonoidState.updateState at state/api/MonoidState.scala:40-47).
  *
  * Differences by design:
  *  - No `Group.minus` (reference: state/impl/WindowState.scala:82-98 uses it
  *    to evict expired sliding-window intervals): Spark recomputes window
  *    partials instead of undoing them, so an inverse is never required
  *    (SURVEY §7.4-2).
  *  - No left/right checkpoint split (reference: state/api/MonoidState.scala:26-38):
  *    Spark's state store checkpoints whole buffers per micro-batch.
  *
  * Scale: an `Aggregator` lowers to partial (map-side) + merge (reduce-side)
  * aggregation in the physical plan — the monoid's associativity is exactly
  * what makes 1000-executor partial aggregation legal.
  */
trait GMonoid[T] extends Serializable {
  def zero: T
  def plus(a: T, b: T): T
}

object GMonoid {
  val longSum: GMonoid[Long] = new GMonoid[Long] {
    def zero = 0L; def plus(a: Long, b: Long) = a + b
  }
  val doubleSum: GMonoid[Double] = new GMonoid[Double] {
    def zero = 0.0; def plus(a: Double, b: Double) = a + b
  }
  val longMax: GMonoid[Long] = new GMonoid[Long] {
    def zero = Long.MinValue; def plus(a: Long, b: Long) = math.max(a, b)
  }
  val longMin: GMonoid[Long] = new GMonoid[Long] {
    def zero = Long.MaxValue; def plus(a: Long, b: Long) = math.min(a, b)
  }
  /** map-union monoid (word-count style keyed sums in one value). */
  def mapSum[K]: GMonoid[Map[K, Long]] = new GMonoid[Map[K, Long]] {
    def zero = Map.empty[K, Long]
    def plus(a: Map[K, Long], b: Map[K, Long]) =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
  }
}

/** Typed Aggregator from a monoid + a projection — usable in both batch
  * (`ds.select(agg.toColumn)`) and streaming (`groupByKey(...).agg(...)`). */
class MonoidAggregator[IN, T: Encoder](m: GMonoid[T], f: IN => T)
    extends Aggregator[IN, T, T] {
  override def zero: T = m.zero
  override def reduce(b: T, a: IN): T = m.plus(b, f(a))
  override def merge(b1: T, b2: T): T = m.plus(b1, b2)
  override def finish(r: T): T = r
  override def bufferEncoder: Encoder[T] = implicitly[Encoder[T]]
  override def outputEncoder: Encoder[T] = implicitly[Encoder[T]]
}

object MonoidAggregator {
  def longSumOf[IN](f: IN => Long): MonoidAggregator[IN, Long] =
    new MonoidAggregator[IN, Long](GMonoid.longSum, f)(Encoders.scalaLong)
  def doubleSumOf[IN](f: IN => Double): MonoidAggregator[IN, Double] =
    new MonoidAggregator[IN, Double](GMonoid.doubleSum, f)(Encoders.scalaDouble)
}
