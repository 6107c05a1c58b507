package graft.operators

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check for the min-label-propagation connected components
  * behind dedup_clusters: on ARBITRARY graphs (not just the corpus's tiny
  * near-dup components) every node's cluster id must equal the minimum
  * doc_id reachable from it — verified against an in-memory union-find. */
class ConnectedComponentsPropertySpec extends SparkTestBase {

  private def unionFind(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 24) // node universe size
    m <- Gen.choose(1, 40) // edge count (long chains, stars, forests...)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.filter(e => e._1 != e._2)

  test("cluster id == min reachable node, on arbitrary graphs (vs union-find)") {
    import spark.implicits._
    // suite hygiene: drop cached relations accumulated by earlier suites
    // before the iterative joins (their task page requests otherwise
    // thrash against pinned storage memory)
    spark.catalog.clearCache()
    val params = SCTest.Parameters.default.withMinSuccessfulTests(6)
    val r = SCTest.check(params, Prop.forAll(edgesGen) { edges =>
      edges.isEmpty || {
        val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        got == unionFind(nodes, edges)
      }
    })
    assert(r.passed, r.status.toString)
  }
}
