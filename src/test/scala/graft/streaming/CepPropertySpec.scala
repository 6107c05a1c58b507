package graft.streaming

import java.sql.Timestamp

import graft.streaming.Cep.CepEvent
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, TestGroupState}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Batch-boundary invariance for the CEP detectors: chopping one event
  * stream into arbitrary micro-batches (with arbitrary arrival order inside
  * each batch) must emit exactly what a single batch of the whole stream
  * emits — i.e. the keyed state round-trips losslessly across batches.
  * Driven at the unit level through Spark's public TestGroupState, so
  * hundreds of random streams run in milliseconds (no streaming queries).
  * Watermark is held at 0 so no state times out; timer-expiry paths are
  * covered by CepSpec end-to-end. */
class CepPropertySpec extends AnyFunSuite {

  private def ev(etype: String, t: Long) = CepEvent("k", etype, new Timestamp(t))

  /** Run `process` over the batches, threading state like the engine does. */
  private def drive[S, OUT](batches: Seq[Seq[CepEvent]],
      process: (String, Iterator[CepEvent], GroupState[S]) => Iterator[OUT]): Seq[OUT] = {
    var stateOpt: Option[S] = None
    batches.flatMap { batch =>
      val st = TestGroupState.create[S](
        stateOpt.map(Optional.of[S]).getOrElse(Optional.empty[S]()),
        GroupStateTimeout.EventTimeTimeout(), 1000L, Optional.of(0L), false)
      val out = process("k", batch.iterator, st).toList
      stateOpt = if (st.isRemoved) None else if (st.isUpdated) Some(st.get) else stateOpt
      out
    }
  }

  // sorted event times, random types, then chopped at random boundaries and
  // shuffled inside each chunk (event-time order across chunks holds, as
  // the watermark guarantees in a real stream). Chunks NEVER split a run
  // of equal timestamps: a watermark orders TIMESTAMPS, not ties — two
  // equal-ts events landing in different micro-batches process in arrival
  // order, which can differ from the batch leg's (ts, etype) tie-break,
  // and the SEQUENCE detector's chain-START transition is sensitive to
  // that order (found live by this generator in r17: [b@872] then
  // [a@872] across a boundary started a chain the single-batch a-then-b
  // order never starts — see the tie caveat on Cep.stepChain; the pair
  // and absence detectors are immune, their transitions are all strict
  // inequalities). Within a chunk ties are fair game — the per-batch
  // (ts, etype) sort canonicalizes them.
  private val streamGen: Gen[List[List[CepEvent]]] = for {
    n <- Gen.choose(1, 60)
    types <- Gen.listOfN(n, Gen.oneOf("a", "b", "noise"))
    gaps <- Gen.listOfN(n, Gen.choose(0L, 40L))
    cuts <- Gen.listOfN(n, Gen.choose(0, 3))
    shuffles <- Gen.listOfN(n, Gen.choose(0, 1000))
  } yield {
    val ts = gaps.scanLeft(1L)(_ + _).tail
    val events = types.lazyZip(ts).map(ev)
    val chunks = events.lazyZip(cuts).foldLeft(List(List.empty[CepEvent])) {
      case (acc, (e, cut)) =>
        val sameTsAsPrev = acc.head.headOption.exists(_.ts.getTime == e.ts.getTime)
        if (cut == 0 && acc.head.nonEmpty && !sameTsAsPrev) List(e) :: acc
        else (e :: acc.head) :: acc.tail
    }.map(_.reverse).reverse
    // deterministic pseudo-shuffle inside each chunk
    chunks.map(c => c.sortBy(e => shuffles(((e.ts.getTime % n) + n).toInt % n)))
  }

  private def check(name: String)(run: Seq[Seq[CepEvent]] => Seq[Any]): Unit = {
    val prop = Prop.forAll(streamGen) { batches =>
      val whole = run(Seq(batches.flatten))
      val chopped = run(batches)
      if (whole != chopped)
        println(s"[$name] mismatch\n whole=$whole\n chopped=$chopped\n batches=$batches")
      whole == chopped
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("pair detector is batch-boundary invariant") {
    check("pair") { batches =>
      drive[Long, Cep.PatternMatch](batches,
        new Cep.Detector("a", "b", 50L).process)
    }
  }

  test("sequence detector is batch-boundary invariant") {
    check("seq") { batches =>
      drive[(Int, Long, Long), Cep.SeqMatch](batches,
        new Cep.SeqDetector(Seq("a", "noise", "b"), 80L).process)
    }
  }

  test("absence detector is batch-boundary invariant") {
    check("absence") { batches =>
      drive[Long, Cep.AbsenceAlert](batches,
        new Cep.AbsenceDetector("a", "b", 50L).process)
    }
  }
}
