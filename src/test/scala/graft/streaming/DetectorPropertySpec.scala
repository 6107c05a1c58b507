package graft.streaming

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Batch-boundary invariance for the r16 detector additions, the same
  * discipline CepPropertySpec applies to the CEP automata: chopping one
  * event stream into arbitrary micro-batches (with arbitrary arrival
  * order inside each batch) must emit exactly what a single batch of the
  * whole stream emits. Driven at the unit level through Spark's public
  * TestGroupState so hundreds of ScalaCheck-random streams run in
  * milliseconds; the end-to-end MemoryStream chop is PageHinkleySpec's
  * job (one randomized run against the hand-rolled prefix reference). */
class DetectorPropertySpec extends AnyFunSuite {

  /** Thread per-key state across batches exactly like the engine: each
    * batch groups by key, each key's fold sees its own carried state. */
  private def drive(batches: Seq[Seq[FfEvent]],
      det: PageHinkley.Detector): Set[PhOut] = {
    val states = collection.mutable.Map.empty[Long, PhState]
    batches.flatMap { batch =>
      batch.groupBy(_.user_id).toSeq.sortBy(_._1).flatMap { case (k, evs) =>
        val st = TestGroupState.create[PhState](
          states.get(k).map(Optional.of[PhState])
            .getOrElse(Optional.empty[PhState]()),
          GroupStateTimeout.NoTimeout(), 1000L, Optional.empty[Long](), false)
        val out = det.process(k, evs.iterator, st).toList
        if (st.isUpdated) states(k) = st.get
        out
      }
    }.toSet
  }

  // monotone event times (ties allowed — (ts, event_id) is the total
  // order), 3 keys, optional values (nulls must be skipped without
  // corrupting state), chopped at random boundaries with a deterministic
  // pseudo-shuffle inside each chunk (cross-chunk event-time order holds,
  // as the watermark guarantees in a real stream)
  private val streamGen: Gen[List[List[FfEvent]]] = for {
    n <- Gen.choose(1, 60)
    keys <- Gen.listOfN(n, Gen.choose(0L, 2L))
    vs <- Gen.listOfN(n, Gen.option(Gen.choose(-5000, 15000).map(_ / 100.0)))
    gaps <- Gen.listOfN(n, Gen.choose(0L, 40L))
    cuts <- Gen.listOfN(n, Gen.choose(0, 3))
  } yield {
    val ts = gaps.scanLeft(1L)(_ + _).tail
    val events = (0 until n).map(i =>
      FfEvent(i.toLong, keys(i), new Timestamp(ts(i)), vs(i))).toList
    val chunks = events.lazyZip(cuts).foldLeft(List(List.empty[FfEvent])) {
      case (acc, (e, cut)) =>
        if (cut == 0 && acc.head.nonEmpty) List(e) :: acc
        else (e :: acc.head) :: acc.tail
    }.map(_.reverse).reverse
    chunks.map(_.sortBy(e => (e.event_id * 2654435761L) % 97))
  }

  test("Page-Hinkley fold is batch-boundary invariant (bit-exact, any chopping)") {
    val det = new PageHinkley.Detector(delta = 0.005, lambda = 20.0)
    val prop = Prop.forAll(streamGen) { batches =>
      val whole = drive(Seq(batches.flatten), det)
      val chopped = drive(batches, det)
      if (whole != chopped)
        println(s"[ph] mismatch\n whole=$whole\n chopped=$chopped\n batches=$batches")
      whole == chopped
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"page-hinkley: ${res.status}")
  }
}

/** The batch detectors' analog of chopping invariance: cusumChangepoint
  * and anomalyMad are offline (whole-series window / aggregate) queries,
  * so "any chopping converges" means ARRIVAL ORDER and PARTITIONING must
  * not move a single bit — randomized row shuffles + random repartitions
  * produce identical results (their tie-breaks are total orders, their
  * arithmetic exact integers; this pins that neither ever leaks a
  * partition-order dependence). */
class DetectorOrderInvarianceSpec extends graft.SparkTestBase {
  import scala.util.Random

  private def randomEvents(rng: Random, n: Int): Seq[(Long, Long, Timestamp, Double)] = {
    val base = 1700000000000L
    (0 until n).map { i =>
      (i.toLong, rng.nextInt(4).toLong,
        new Timestamp(base + rng.nextInt(5000) * 1000L),
        (rng.nextInt(20000) - 5000) / 100.0)
    }
  }

  test("cusumChangepoint is arrival-order and partitioning invariant") {
    import spark.implicits._
    val rng = new Random(41)
    for (seed <- 1 to 6) {
      val evs = randomEvents(new Random(seed), 12 + rng.nextInt(80))
      val ordered = evs.toDF("id", "key", "at", "v")
      val shuffled = new Random(seed * 7 + 1).shuffle(evs)
        .toDF("id", "key", "at", "v").repartition(1 + rng.nextInt(7))
      val a = graft.api.EventAnalytics.cusumChangepoint(ordered, minN = 4)
        .collect().map(_.toSeq).toSet
      val b = graft.api.EventAnalytics.cusumChangepoint(shuffled, minN = 4)
        .collect().map(_.toSeq).toSet
      assert(a == b, s"seed $seed: order/partitioning moved the result\n$a\nvs\n$b")
      assert(a.nonEmpty, s"seed $seed: degenerate fixture (nothing reported)")
    }
  }

  test("anomalyMad is arrival-order and partitioning invariant") {
    import spark.implicits._
    val rng = new Random(43)
    for (seed <- 1 to 6) {
      val evs = randomEvents(new Random(seed + 100), 12 + rng.nextInt(80))
        .map(e => (s"g${e._2}", e._4))
      val ordered = evs.toDF("grp", "v")
      val shuffled = new Random(seed * 13 + 5).shuffle(evs)
        .toDF("grp", "v").repartition(1 + rng.nextInt(7))
      val a = graft.api.EventAnalytics.anomalyMad(ordered)
        .collect().map(_.toSeq).toSet
      val b = graft.api.EventAnalytics.anomalyMad(shuffled)
        .collect().map(_.toSeq).toSet
      assert(a == b, s"seed $seed: order/partitioning moved the result\n$a\nvs\n$b")
      assert(a.nonEmpty, s"seed $seed: degenerate fixture (nothing profiled)")
    }
  }
}
