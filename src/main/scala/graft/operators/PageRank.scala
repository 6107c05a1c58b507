package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation as driver-side DataFrame iteration — parity
  * with the reference's PageRank example, which runs a controller/worker
  * tick protocol until convergence
  * (reference: examples/pagerank/src/main/scala/io/gearpump/examples/pagerank/PageRankController.scala:38-70,
  * PageRankWorker.scala:51-72). Spark-native shape per SURVEY §2.1 #22:
  * a batch loop of join + groupBy-sum per iteration with caching to truncate
  * lineage; "unmanaged message" RPC becomes plain dataframe recursion.
  *
  * Graph: the bipartite supplier<->part graph from lineitem, symmetrized so
  * every node has out-degree (no dangling-mass handling needed).
  */
object PageRank {
  private val Damping = 0.85
  private val Iters = 5
  /** Disjoint-domain tag for supplier node ids. TPC-H partkeys reach
    * 200000*SF (2e7 at SF 100, the ~100 TB point), so a small offset would
    * silently fuse supplier and part nodes at large SF — and identically in
    * the oracle, invisible to the compare. 1e12 clears every realistic SF. */
  private[operators] val SuppOffset = 1000000000000L

  def run(s: SparkSession, dir: String): DataFrame =
    iterate(s, dir, maxIters = Iters, tol = 0.0)

  /** Delta-convergence stop — parity with the reference controller's
    * DELTA-threshold termination (reference:
    * examples/pagerank/src/main/scala/io/gearpump/examples/pagerank/PageRankController.scala:47-70):
    * stop when max |rank_k - rank_{k-1}| < `tol`, capped at `maxIters`.
    * The per-tick delta is one scalar `max` aggregate — a driver-side
    * convergence count, same cost shape as the reference's tick RPC. */
  def runUntilConverged(s: SparkSession, dir: String,
      tol: Double = 1e-6, maxIters: Int = 50): DataFrame =
    iterate(s, dir, maxIters, tol)

  private def iterate(s: SparkSession, dir: String, maxIters: Int, tol: Double): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    val fwd = li.select((col("l_suppkey") + SuppOffset).as("src"), col("l_partkey").as("dst"))
    val rev = li.select(col("l_partkey").as("src"), (col("l_suppkey") + SuppOffset).as("dst"))
    iterateEdges(s, fwd.union(rev).distinct(), maxIters, tol)
  }

  /** The Lloyd-style power-iteration loop over an arbitrary deduplicated
    * (src, dst) edge frame — [[iterate]]'s body, frame-generic so the
    * public facade (api.GraphAlgorithms.pageRank) runs the identical
    * loop on user graphs. Directed semantics: a node's rank divides over
    * its OUT-edges; nodes with no out-edges (dangling) leak their damped
    * mass, the standard simplification (the registry's fixture symmetrizes
    * so none exist there). */
  private[graft] def iterateEdges(s: SparkSession, edgesIn: DataFrame,
      maxIters: Int, tol: Double): DataFrame = {
    val edges = edgesIn.cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // nodes = src ∪ dst: on the registry's symmetrized fixture dst ⊆ src
    // (identical result to the historical src-only derivation, oracle
    // unchanged), but a user's DIRECTED graph has sink nodes that only
    // appear as dst — they must hold rank too
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count() // driver-side scalar; fine at any scale
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val contribs = edges
        .join(deg, "src")
        .join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      // localCheckpoint (eager) truncates the LOGICAL plan too — with cache
      // alone the nested-join plan grows per tick and planning/explain cost
      // explodes after ~tens of iterations (on a cluster: checkpoint to a
      // reliable dir instead; same lineage-cut, executor-loss-safe)
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(0.15 / n) + lit(Damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      if (tol > 0.0) {
        // one scalar per tick: the reference's convergence check
        val delta = next.as("a").join(ranks.as("b"), col("a.node") === col("b.node"))
          .agg(max(abs(col("a.rank") - col("b.rank")))).head().getDouble(0)
        converged = delta < tol
      }
      ranks.unpersist()
      ranks = next
      it += 1
    }
    ranks.select(col("node"), round(col("rank"), 8).as("pr")).orderBy(col("node"))
  }

  /** Oracle: the same 5 power iterations unrolled as chained CTEs. */
  private def iterSql(k: Int): String =
    s"""it$k AS (SELECT e.dst AS node, sum(r.rank / d.deg) AS contrib
                 FROM edges e JOIN deg d ON d.src = e.src
                 JOIN r${k - 1} r ON e.src = r.node GROUP BY e.dst),
        r$k AS (SELECT nodes.node, 0.15 / nn.n + 0.85 * coalesce(it$k.contrib, 0.0) AS rank
                FROM nodes CROSS JOIN nn LEFT JOIN it$k ON it$k.node = nodes.node)"""

  val pagerank = GraftQuery(
    "graph_pagerank",
    run,
    Some(s"""WITH edges AS (
               SELECT DISTINCT l_suppkey + $SuppOffset AS src, l_partkey AS dst FROM lineitem
               UNION
               SELECT DISTINCT l_partkey AS src, l_suppkey + $SuppOffset AS dst FROM lineitem),
             deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
             nodes AS (SELECT DISTINCT src AS node FROM edges),
             nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
             r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
             ${(1 to Iters).map(iterSql).mkString(",\n")}
             SELECT node, round(rank, 8) AS pr FROM r$Iters ORDER BY node"""))

  /** BFS HOP DISTANCE from one source node over the same symmetrized
    * supplier<->part graph — the frontier-expansion iterative pattern
    * (shortest unweighted path), the second classic graph protocol after
    * PageRank. Each tick is (frontier JOIN edges) minus visited — an
    * equi-join plus an anti-join, both key-partitioned; the frontier and
    * visited sets hold (node) / (node, hops) only, never edges. Depth is
    * bounded (4), so the loop is four fixed plans; `localCheckpoint`
    * truncates lineage the same way the PageRank loop does. Oracle: a
    * depth-bounded recursive CTE with UNION dedup. */
  val bfs = GraftQuery(
    "graph_bfs",
    (s, dir) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
      val fwd = li.select((col("l_suppkey") + SuppOffset).as("src"), col("l_partkey").as("dst"))
      val rev = li.select(col("l_partkey").as("src"), (col("l_suppkey") + SuppOffset).as("dst"))
      val edges = fwd.union(rev).distinct().cache()
      val source = 1L
      var visited = Seq((source, 0)).toDF("node", "hops").localCheckpoint(true)
      var frontier = visited.select(col("node"))
      var d = 0
      while (d < 4) {
        d += 1
        val next = frontier.join(edges, col("node") === col("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select(col("node")).as("v"), Seq("node"), "left_anti")
          .localCheckpoint(true)
        visited = visited.union(next.withColumn("hops", lit(d)))
          .localCheckpoint(true)
        frontier = next.select(col("node"))
      }
      edges.unpersist()
      visited.select(col("node"), col("hops")).orderBy(col("node"))
    },
    Some(s"""WITH RECURSIVE edges AS (
               SELECT DISTINCT l_suppkey + $SuppOffset AS src, l_partkey AS dst FROM lineitem
               UNION
               SELECT DISTINCT l_partkey AS src, l_suppkey + $SuppOffset AS dst FROM lineitem),
             walk(node, d) AS (
               SELECT CAST(1 AS BIGINT) AS node, 0 AS d
               UNION
               SELECT e.dst AS node, w.d + 1 AS d
               FROM walk w JOIN edges e ON e.src = w.node
               WHERE w.d < 4)
             SELECT node, CAST(min(d) AS INTEGER) AS hops
             FROM walk GROUP BY node ORDER BY node"""))

  /** HITS HUBS & AUTHORITIES (Kleinberg 1999) on the DIRECTED
    * supplier→part graph — the third classic iterative protocol after
    * PageRank and BFS, and the one whose two-sided scores (good *curator*
    * vs good *content*) PageRank's single score cannot express. Suppliers
    * are pure hubs, parts pure authorities (the graph is bipartite), so
    * each tick is exactly the textbook pair h=A·a, a=Aᵀ·h: two
    * key-partitioned join+sum passes over the edge list.
    *
    * INTEGER-EXACT normalization: instead of the usual L2 norm (an
    * order-dependent float sum over ALL nodes — not reproducible across
    * engines), each vector is rescaled to max=1e6 with `x * 1e6 div max(x)`
    * over exact BIGINTs. max() is order-free, div truncates identically in
    * Spark and DuckDB on non-negative operands, so every score is
    * bit-exact at any parallelism. The per-tick max is one scalar
    * aggregate to the driver — the same cost shape as the PageRank
    * convergence delta. Int64 headroom: scores ≤ 1e6, so a raw sum ≤
    * 1e6·deg_max and the rescale multiplicand ≤ 1e12·deg_max — safe to
    * deg_max ≈ 9·10⁶ (far past any real catalog's suppliers-per-part).
    * Reference frame: the same controller/worker tick protocol as
    * examples/pagerank (PageRankController.scala:38-70), different
    * fixpoint. */
  /** The HITS tick loop on a directed (src, dst) edge list — factored out
    * so property specs can pin the fixpoint on synthetic graphs (the
    * GraphOpsSpec pattern). Returns (kind, node, score_ppm) with kind
    * 'hub' for src-side nodes and 'auth' for dst-side. */
  private[operators] def hitsScores(edges: DataFrame, iters: Int): DataFrame = {
    var auth = edges.select(col("dst").as("node")).distinct()
      .withColumn("a", lit(1000000L))
      .localCheckpoint(true)
    var hub: DataFrame = null
    var it = 0
    while (it < iters) {
      val hRaw = edges.join(auth, col("dst") === col("node"))
        .groupBy(col("src")).agg(sum(col("a")).as("h_raw"))
      val hMax = hRaw.agg(max(col("h_raw"))).head().getLong(0)
      hub = hRaw
        .select(col("src"), expr(s"h_raw * 1000000 div ${hMax}L").as("h"))
        .localCheckpoint(true)
      val aRaw = edges.join(hub, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("h")).as("a_raw"))
      val aMax = aRaw.agg(max(col("a_raw"))).head().getLong(0)
      auth = aRaw
        .select(col("dst").as("node"), expr(s"a_raw * 1000000 div ${aMax}L").as("a"))
        .localCheckpoint(true)
      it += 1
    }
    hub.select(lit("hub").as("kind"), col("src").as("node"), col("h").as("score_ppm"))
      .union(auth.select(lit("auth").as("kind"), col("node"), col("a").as("score_ppm")))
  }

  val hits = GraftQuery(
    "graph_hits",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
      val edges = li.select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
        .distinct().cache()
      val out = hitsScores(edges, iters = 3).orderBy(col("kind"), col("node"))
      edges.unpersist()
      out
    },
    Some("""WITH edges AS MATERIALIZED (
               SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
             a0 AS (SELECT DISTINCT dst AS node, CAST(1000000 AS BIGINT) AS a FROM edges),
             h1r AS MATERIALIZED (
               SELECT e.src, CAST(sum(a.a) AS BIGINT) AS h_raw
               FROM edges e JOIN a0 a ON a.node = e.dst GROUP BY e.src),
             h1 AS MATERIALIZED (
               SELECT src, CAST(h_raw * 1000000 // (SELECT max(h_raw) FROM h1r) AS BIGINT) AS h FROM h1r),
             a1r AS MATERIALIZED (
               SELECT e.dst, CAST(sum(h.h) AS BIGINT) AS a_raw
               FROM edges e JOIN h1 h ON h.src = e.src GROUP BY e.dst),
             a1 AS MATERIALIZED (
               SELECT dst AS node, CAST(a_raw * 1000000 // (SELECT max(a_raw) FROM a1r) AS BIGINT) AS a FROM a1r),
             h2r AS MATERIALIZED (
               SELECT e.src, CAST(sum(a.a) AS BIGINT) AS h_raw
               FROM edges e JOIN a1 a ON a.node = e.dst GROUP BY e.src),
             h2 AS MATERIALIZED (
               SELECT src, CAST(h_raw * 1000000 // (SELECT max(h_raw) FROM h2r) AS BIGINT) AS h FROM h2r),
             a2r AS MATERIALIZED (
               SELECT e.dst, CAST(sum(h.h) AS BIGINT) AS a_raw
               FROM edges e JOIN h2 h ON h.src = e.src GROUP BY e.dst),
             a2 AS MATERIALIZED (
               SELECT dst AS node, CAST(a_raw * 1000000 // (SELECT max(a_raw) FROM a2r) AS BIGINT) AS a FROM a2r),
             h3r AS MATERIALIZED (
               SELECT e.src, CAST(sum(a.a) AS BIGINT) AS h_raw
               FROM edges e JOIN a2 a ON a.node = e.dst GROUP BY e.src),
             h3 AS MATERIALIZED (
               SELECT src, CAST(h_raw * 1000000 // (SELECT max(h_raw) FROM h3r) AS BIGINT) AS h FROM h3r),
             a3r AS MATERIALIZED (
               SELECT e.dst, CAST(sum(h.h) AS BIGINT) AS a_raw
               FROM edges e JOIN h3 h ON h.src = e.src GROUP BY e.dst),
             a3 AS MATERIALIZED (
               SELECT dst AS node, CAST(a_raw * 1000000 // (SELECT max(a_raw) FROM a3r) AS BIGINT) AS a FROM a3r)
             SELECT 'hub' AS kind, src AS node, h AS score_ppm FROM h3
             UNION ALL
             SELECT 'auth' AS kind, node, a AS score_ppm FROM a3
             ORDER BY kind, node"""))

  /** PERSONALIZED PAGERANK: random walks that teleport back to a SEED SET
    * instead of the uniform distribution — the relevance-to-these-nodes
    * score behind recommendation ("parts related to what supplier group S
    * touches") and local community detection. Same symmetrized
    * supplier<->part graph, same 5-tick power iteration and float
    * discipline as [[pagerank]] (per-node group-by sums, round(,8));
    * the ONLY change is the teleport vector: 0.15/|S| on seeds
    * (node % 17 == 0), 0 elsewhere — so mass decays with distance from
    * the seeds and unreachable nodes go to 0, which is the point.
    * |S| is one driver-side scalar, exactly like [[pagerank]]'s n. */
  val ppr = GraftQuery(
    "graph_personalized_pagerank",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
      val fwd = li.select((col("l_suppkey") + SuppOffset).as("src"), col("l_partkey").as("dst"))
      val rev = li.select(col("l_partkey").as("src"), (col("l_suppkey") + SuppOffset).as("dst"))
      val edges = fwd.union(rev).distinct().cache()
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nodes = edges.select(col("src").as("node")).distinct().cache()
      val nSeeds = nodes.filter(col("node") % 17 === 0).count()
      val teleport = when(col("node") % 17 === 0, lit(0.15 / nSeeds)).otherwise(lit(0.0))
      var ranks = nodes.withColumn("rank",
        when(col("node") % 17 === 0, lit(1.0 / nSeeds)).otherwise(lit(0.0)))
      var it = 0
      while (it < Iters) {
        val contribs = edges
          .join(deg, "src")
          .join(ranks, col("src") === col("node"))
          .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
        val next = nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            (teleport + lit(Damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
          .localCheckpoint(true)
        ranks.unpersist()
        ranks = next
        it += 1
      }
      edges.unpersist()
      ranks.select(col("node"), round(col("rank"), 8).as("ppr")).orderBy(col("node"))
    },
    Some(s"""WITH edges AS (
               SELECT DISTINCT l_suppkey + $SuppOffset AS src, l_partkey AS dst FROM lineitem
               UNION
               SELECT DISTINCT l_partkey AS src, l_suppkey + $SuppOffset AS dst FROM lineitem),
             deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
             nodes AS (SELECT DISTINCT src AS node FROM edges),
             nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes WHERE node % 17 = 0),
             r0 AS (SELECT node,
                      CASE WHEN node % 17 = 0 THEN 1.0 / nn.n ELSE 0.0 END AS rank
                    FROM nodes CROSS JOIN nn),
             ${(1 to Iters).map(pprIterSql).mkString(",\n")}
             SELECT node, round(rank, 8) AS ppr FROM r$Iters ORDER BY node"""))

  /** Oracle tick for [[ppr]]: seed-restricted teleport, else [[iterSql]]. */
  private def pprIterSql(k: Int): String =
    s"""it$k AS (SELECT e.dst AS node, sum(r.rank / d.deg) AS contrib
                 FROM edges e JOIN deg d ON d.src = e.src
                 JOIN r${k - 1} r ON e.src = r.node GROUP BY e.dst),
        r$k AS (SELECT nodes.node,
                  CASE WHEN nodes.node % 17 = 0 THEN 0.15 / nn.n ELSE 0.0 END
                    + 0.85 * coalesce(it$k.contrib, 0.0) AS rank
                FROM nodes CROSS JOIN nn LEFT JOIN it$k ON it$k.node = nodes.node)"""

  val all: Seq[GraftQuery] = Seq(pagerank, bfs, hits, ppr)
}
