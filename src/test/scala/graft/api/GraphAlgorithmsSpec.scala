package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The public graph facade must work on user-supplied edges (arbitrary
  * column names, graphs the fixture never shaped) — the "switch to this
  * library" contract, exercised end to end per algorithm. */
class GraphAlgorithmsSpec extends SparkTestBase {

  test("public facade runs every algorithm on a user graph") {
    import spark.implicits._
    // two triangles bridged by a path: 1-2-3 (tri), 3-4, 4-5, 5-6-7 (tri)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L)).toDF("from", "to")

    val cc = GraphAlgorithms.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 7 && cc.values.toSet == Set(1L))

    // with a pendant 8 hung off 4, the 2-core peels exactly the pendant
    val withPendant = pairs.union(Seq((4L, 8L)).toDF("from", "to"))
    val core = GraphAlgorithms.kCore(withPendant, 2)
      .as[(Long, Long)].collect().toMap
    assert(core.keySet == (1L to 7L).toSet,
      s"2-core peels the pendant, keeps the bridged triangles: $core")

    val und = pairs.select(col("from").as("src"), col("to").as("dst"), lit(1L).as("w"))
      .union(pairs.select(col("to").as("src"), col("from").as("dst"), lit(1L).as("w")))
    val sp = GraphAlgorithms.shortestPaths(
      und, Seq((1L, 0L)).toDF("node", "dist"), maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(sp(7L) == 4L && sp(4L) == 2L, s"hop distances: $sp")

    val lv = GraphAlgorithms.louvain(pairs.toDF("u", "v"))
    assert(lv.map(_._3).sliding(2).forall(p => p.head <= p.last),
      s"Q must be non-decreasing: $lv")
    assert(lv.last._2 <= 3, s"two bridged triangles resolve to few communities: $lv")

    val undNoW = und.select(col("src"), col("dst"))
    val btw = GraphAlgorithms.betweennessDeltas(undNoW, Seq(1L, 7L), hops = 4)
      .groupBy(col("v")).agg(sum(col("delta")).as("d"))
      .as[(Long, Long)].collect().toMap
    // the bridge nodes 3/4/5 carry the cross-triangle dependency
    assert(btw(4L) > btw(2L), s"bridge must out-broker a triangle flank: $btw")

    val harm = GraphAlgorithms.harmonicCloseness(undNoW, Seq(1L, 7L), hops = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // hand-computed: 3 and 5 sit at dist 1 from one seed, 3 from the other
    // (1e6 + 333333); seed-adjacent flanks score 1e6 + 250000; the exact
    // integer micros pin the 1e6-div-dist arithmetic through the facade
    assert(harm(3L) == 1333333L && harm(5L) == 1333333L, s"harmonic: $harm")
    assert(harm(2L) == 1250000L && harm(4L) == 1000000L, s"harmonic: $harm")

    val cn = GraphAlgorithms.commonNeighbors(pairs)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, n, _) => (a, b) -> n }.toMap
    assert(cn((1L, 3L)) == 1L && cn((4L, 6L)) == 1L, s"wedges: $cn")
  }

  test("triangles: exact per-node counts on a planted clique plus a dangler") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in C(3,2) = 3) plus the
    // triangle-free pendant edge 4-5; duplicate edge rows must not
    // double-count
    // adversarial rows the canonicalization must absorb: a self-loop (a
    // loop lets a wedge close on its own generating edge — a phantom
    // triangle), a reversed duplicate, and an exact duplicate
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val pairs = (k4 ++ Seq((4L, 5L), (1L, 2L), (2L, 1L), (3L, 3L)))
      .toDF("p", "q")
    val tri = GraphAlgorithms.triangles(pairs)
      .as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"$tri")
  }

  test("pageRank: closed-form fixed points on user edge frames") {
    import spark.implicits._
    // 2-node cycle: the symmetric fixed point is exactly 0.5 / 0.5
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("from", "to")
    val pr2 = GraphAlgorithms.pageRank(cycle)
      .as[(Long, Double)].collect().toMap
    assert(pr2 == Map(1L -> 0.5, 2L -> 0.5), s"2-cycle fixed point: $pr2")
    // star with spokes -> hub: the hub absorbs every spoke's full rank.
    // Closed form at n = 5 (hub + 4 dangling spokes): spoke = 0.15/5 = 0.03,
    // hub = 0.03 + 0.85 * 4 * 0.03 = 0.132 (spokes keep only the teleport
    // share; their damped mass leaks, the documented dangling contract)
    val star = (2L to 5L).map(s => (s, 1L)).toDF("s", "d")
    val prS = GraphAlgorithms.pageRank(star)
      .as[(Long, Double)].collect().toMap
    assert(prS(1L) == 0.132 && (2L to 5L).forall(prS(_) == 0.03),
      s"star fixed point: $prS")
    // a sink-only node (appears only as dst) must still hold rank
    assert(prS.size == 5, s"sink hub must be in the node set: $prS")
  }

  test("clusteringCoefficient: exact micros on a triangle with a pendant") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4 on node 1: node 1 closes 1 of its
    // C(3,2)=3 neighbor pairs (1/3), nodes 2 and 3 close their only pair
    // (1.0), node 4 has degree 1 and is excluded
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("x", "y")
    val rows = GraphAlgorithms.clusteringCoefficient(pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows == Map(
      1L -> ((3L, 1L, 333333L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((2L, 1L, 1000000L))), s"$rows")
  }

  test("assortativity: a star is maximally disassortative (-1), a regular cycle reads null") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("x", "y")
    assert(GraphAlgorithms.assortativity(star).head().getLong(4) == -1000000L)
    // 4-cycle: every node degree 2 — zero degree variance, r undefined
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("x", "y")
    assert(GraphAlgorithms.assortativity(cycle).head().isNullAt(4),
      "a regular graph must report null, not a fabricated 0")
  }

  test("jaccardSimilarity: exact micro scores on a square; existing edges are never predicted") {
    import spark.implicits._
    // 4-cycle 1-2-3-4: opposite corners share BOTH neighbors (2/2 = 1.0);
    // adjacent corners share none and generate no candidate row
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("x", "y")
    val rows = GraphAlgorithms.jaccardSimilarity(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows == Map(
      (1L, 3L) -> ((2L, 1000000L)), (2L, 4L) -> ((2L, 1000000L))), s"$rows")
    // a triangle's pairs all share the third corner but are ALL adjacent
    // — link prediction must return nothing (r16 second review: the
    // anti-join against existing edges)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("x", "y")
    assert(GraphAlgorithms.jaccardSimilarity(tri).count() == 0,
      "existing edges must not be predicted")
    intercept[IllegalArgumentException] {
      GraphAlgorithms.jaccardSimilarity(pairs, hubCap = 0)
    }
  }

  test("jaccardSimilarity: hub cap filters numerator AND denominator consistently") {
    import spark.implicits._
    // a and b share hub h (degree 4 > cap 2) and non-hub c (degree 2).
    // Filtered neighborhoods at hubCap=2: N'(a) = N'(b) = {c}, so
    // n_common = 1 and jaccard = 1/(1+1-1) = 1.0 exactly. The pre-r17
    // form charged h's edges to the union but not the intersection
    // (1/(2+2-1) = 333333) — the advisor's inconsistency, pinned fixed.
    val g = Seq((10L, 1L), (10L, 2L), (10L, 8L), (10L, 9L), // hub 10, deg 4
      (20L, 1L), (20L, 2L)).toDF("x", "y") // non-hub 20, deg 2
    val rows = GraphAlgorithms.jaccardSimilarity(g, hubCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.get((1L, 2L)).contains((1L, 1000000L)), s"$rows")
    // a pair whose EVERY shared neighbor is a hub is absent (empty
    // filtered intersection — documented, not a score of 0)
    assert(!rows.contains((8L, 9L)), s"$rows")
  }

  test("labelPropagation: seeds clamp, labels spread with min-label ties, unlabeled islands stay out") {
    import spark.implicits._
    // path 1-2-3-4-5 seeded at the ends, traced through the SYNCHRONOUS
    // rounds (each round re-votes every non-seed from the previous
    // round's labels): r1 — 2 adopts 10, 4 adopts 20; r2 — 3 sees both
    // camps tied 1-1 and takes the MIN label (10); r3 — 4 now sees
    // 3(10) vs 5(20) tied and ALSO flips to the min label 10. The
    // min-label tie-break cascades deterministically toward the smaller
    // seed on symmetric paths — exactly what a total order promises.
    // node 9 is an unlabeled island edge — never labeled.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 8L))
      .toDF("x", "y")
    val labeled = Seq((1L, 10L), (5L, 20L)).toDF("n", "lab")
    val rows = GraphAlgorithms.labelPropagation(pairs, labeled)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 10L, 5L -> 20L),
      s"$rows")
    // at rounds = 1 only the seeds' direct neighbors are labeled
    val one = GraphAlgorithms.labelPropagation(pairs, labeled, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 10L, 2L -> 10L, 4L -> 20L, 5L -> 20L), s"$one")
    intercept[IllegalArgumentException] {
      GraphAlgorithms.labelPropagation(pairs, labeled, rounds = 0)
    }
    // a reversed duplicate edge must NOT double a camp's vote: (3,5) and
    // (5,3) canonicalize to one edge, so node 3 sees a 1-1 tie and takes
    // the min label — not a 2-1 win for 20 (r16 second review)
    val dupEdges = Seq((1L, 3L), (3L, 5L), (5L, 3L)).toDF("x", "y")
    val dup = GraphAlgorithms.labelPropagation(dupEdges, labeled, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup(3L) == 10L, s"duplicate edge inflated a vote: $dup")
    // exact duplicate seed rows collapse; CONFLICTING labels fail loudly
    val okDup = GraphAlgorithms.labelPropagation(pairs,
      Seq((1L, 10L), (1L, 10L), (5L, 20L)).toDF("n", "lab"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(okDup == one, s"exact-duplicate seeds must collapse: $okDup")
    val e = intercept[IllegalArgumentException] {
      GraphAlgorithms.labelPropagation(pairs,
        Seq((1L, 10L), (1L, 20L)).toDF("n", "lab"))
    }
    assert(e.getMessage.contains("conflicting seed labels"), e.getMessage)
    // a seeded node with NO edges still appears with its clamped label —
    // the clamp contract covers it even though it can't propagate
    // (r16 advisor: edge-derived node sets silently dropped it)
    val isolated = GraphAlgorithms.labelPropagation(pairs,
      Seq((1L, 10L), (5L, 20L), (77L, 30L)).toDF("n", "lab"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(isolated.get(77L).contains(30L),
      s"edge-absent seed must keep its clamped label: $isolated")
    assert(isolated - 77L == rows, s"other labels must be unchanged: $isolated")
  }
}
