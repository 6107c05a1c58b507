package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** HITS properties the oracle can't see: the fixpoint shape on synthetic
  * graphs where the right answer is derivable by hand, and the
  * normalization invariant (max score is exactly 1e6 on both sides every
  * tick, so scores are comparable across iterations and graphs). */
class HitsSpec extends SparkTestBase {

  private def scores(edges: org.apache.spark.sql.DataFrame, iters: Int) =
    PageRank.hitsScores(edges, iters)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("star + spoke: the big curator is the top hub, its shared part the top authority") {
    import spark.implicits._
    // supplier 1 curates parts 1..5; supplier 2 touches only part 1
    val edges = (Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)) ++
      Seq((2L, 1L))).toDF("src", "dst")
    val got = scores(edges, iters = 3)
    assert(got(("hub", 1L)) == 1000000L, "5-part supplier must be the max hub")
    assert(got(("hub", 2L)) < got(("hub", 1L)))
    assert(got(("auth", 1L)) == 1000000L,
      "the doubly-curated part must be the max authority")
    assert((2L to 5L).forall(p => got(("auth", p)) < got(("auth", 1L))))
    assert((2L to 5L).map(p => got(("auth", p))).distinct.size == 1,
      "symmetric spokes must tie exactly")
  }

  test("disconnected equal stars tie bit-exactly; normalization keeps max at 1e6") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)).toDF("src", "dst")
    for (iters <- 1 to 3) {
      val got = scores(edges, iters)
      assert(got(("hub", 1L)) == got(("hub", 2L)))
      assert(got(("hub", 1L)) == 1000000L)
      assert(Seq(10L, 11L, 20L, 21L).map(p => got(("auth", p))).toSet == Set(1000000L),
        "symmetric authorities must all sit at the normalization cap")
    }
  }

  test("hub ranking follows curation breadth on a bipartite fan") {
    import spark.implicits._
    // suppliers 1,2,3 curate 1,3,6 distinct parts respectively
    val edges = (Seq((1L, 100L)) ++
      (1L to 3L).map(i => (2L, 200L + i)) ++
      (1L to 6L).map(i => (3L, 300L + i))).toDF("src", "dst")
    val got = scores(edges, iters = 3)
    assert(got(("hub", 3L)) > got(("hub", 2L)))
    assert(got(("hub", 2L)) > got(("hub", 1L)))
  }
}
