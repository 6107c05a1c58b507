package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The engine keeps several argmin/argmax aggregations inside HashAggregate
  * by packing (score, id) into ONE long (dedup_priority_keep, emb_pq_assign,
  * emb_kmeans_assign, KMeans.train). These properties pin the packing
  * algebra at its documented bounds: a primitive min/max over packed values
  * must equal the lexicographic argmin/argmax it replaces — including ties,
  * where the lower id must win. */
class PackedArgminPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // dedup_priority_keep: packed = prio * 2^40 + doc_id; min == lex min
  test("priority-keep packing: min(packed) == lexicographic (prio, doc_id) min") {
    val gen = Gen.nonEmptyListOf(for {
      prio <- Gen.choose(0L, (1L << 23) - 1)
      doc <- Gen.choose(0L, (1L << 40) - 1)
    } yield (prio, doc))
    check("priority-keep", Prop.forAll(gen) { xs =>
      val best = xs.map { case (p, d) => (p << 40) + d }.min
      ((best >> 40) & ((1L << 23) - 1), best & ((1L << 40) - 1)) == xs.min
    })
  }

  // emb_pq_assign: packed = dm * 16 + code (dm < 2^43, code < 16)
  test("PQ packing: min(packed) == lexicographic (dist, code) min") {
    val gen = Gen.nonEmptyListOf(for {
      dm <- Gen.choose(0L, (1L << 43) - 1)
      code <- Gen.choose(0L, 15L)
    } yield (dm, code))
    check("pq", Prop.forAll(gen) { xs =>
      val best = xs.map { case (dm, c) => dm * 16L + c }.min
      (best / 16L, best % 16L) == xs.min
    })
  }

  // emb_kmeans_assign / KMeans.train: packed = (score + off) * k + (k-1 - id);
  // max picks the HIGHEST score and the LOWEST id on a score tie
  test("k-means packing: max(packed) == (max score, min id on ties)") {
    val k = 256L
    val gen = Gen.nonEmptyListOf(for {
      cs <- Gen.choose(-1000000L, 1000000L) // cs_scaled in [-1e6, 1e6]
      id <- Gen.choose(0L, k - 1)
    } yield (cs, id))
    check("kmeans", Prop.forAll(gen) { xs =>
      val best = xs.map { case (cs, id) => (cs + 1000000L) * k + (k - 1 - id) }.max
      val maxScore = xs.map(_._1).max
      val minIdAtMax = xs.filter(_._1 == maxScore).map(_._2).min
      ((best / k) - 1000000L, k - 1 - best % k) == ((maxScore, minIdAtMax))
    })
  }
}
