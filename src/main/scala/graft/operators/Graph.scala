package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph compute in the Spark idiom: each superstep is one
  * keyed join + one aggregation (contributions shuffled by dst), the
  * driver holds no graph state, and per-step contributions round to
  * scale-12 decimals so the whole iteration is bit-identical under
  * any partitioning (same device as [[Ann.pcaTopComponent]]).
  */
object Graph {

  /** PageRank over an edge list. Dangling nodes are avoided by
    * construction here (callers pass symmetrized edges); the general
    * dangling-mass redistribution would add one scalar aggregate per
    * step. Rank mass is conserved: sum(rank) = 1 every step (spec'd).
    */
  def pageRank(edges: DataFrame, iters: Int = 10, d: Double = 0.85)
      : DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // degree is LOOP-INVARIANT: join it onto the edges once, outside
    // the supersteps — the resident (src, dst, deg) edge index is
    // what every iteration reads (10 joins saved over the naive loop)
    val e = edges.persist(lvl)
    val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist(lvl)
    val nodes = e.select(col("src").as("node")).distinct().persist(lvl)
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    try {
      for (_ <- 1 to iters) {
        // ranks is node-count rows — broadcasts at any realistic
        // cells-per-executor budget; the only shuffle per superstep
        // is the dst-keyed contribution aggregation
        val contribs = eDeg.join(ranks, col("src") === col("node"))
          .select(col("dst"),
            round(col("rank") / col("deg"), 12)
              .cast(DecimalType(28, 12)).as("c"))
          .groupBy("dst").agg(sum(col("c")).as("in"))
        ranks = nodes.join(contribs, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit((1 - d) / n) +
              lit(d) * coalesce(col("in").cast("double"), lit(0.0))).as("rank"))
        // cut the lineage each step: chained join plans otherwise
        // grow the optimizer's work quadratically
        ranks = ranks.localCheckpoint(eager = false)
      }
      ranks.persist(lvl).count(): Unit // materialize before unpersists
      ranks
    } finally {
      eDeg.unpersist(blocking = false)
      e.unpersist(blocking = false)
      nodes.unpersist(blocking = false): Unit
    }
  }

  /** Customer<->supplier trading graph: an edge per distinct
    * (customer, supplier) pair that traded, symmetrized (so no node
    * dangles and the chain is irreducible). Supplier ids are offset
    * into their own namespace.
    */
  def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 10000000L).as("dst"))
      .distinct()
    base.unionByName(
      base.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Multi-source BFS: hop distance from `sources` to every node
    * within `maxDepth` hops. Classic frontier iteration in the Spark
    * idiom — each superstep is one (frontier JOIN edges) shuffle plus
    * an anti join against the visited set; the frontier only ever
    * holds NEW nodes, so total work is O(edges x depth) worst case
    * and the driver holds no graph state. Lineage is cut per step
    * (localCheckpoint) exactly as in [[pageRank]].
    */
  def shortestPaths(edges: DataFrame, sources: DataFrame, maxDepth: Int)
      : DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.persist(lvl)
    var visited = sources.select(col("node"), lit(0).as("dist"))
      .localCheckpoint(eager = true)
    var frontier = visited
    try {
      var d = 0
      while (d < maxDepth && !frontier.isEmpty) {
        d += 1
        val next = frontier.join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("dist", lit(d))
          .localCheckpoint(eager = true)
        visited = visited.unionByName(next).localCheckpoint(eager = true)
        frontier = next
      }
      visited
    } finally e.unpersist(blocking = false): Unit
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // PageRank on the trading graph — iterative -> rows-only for the
    // driver; GraphSpec pins a hand-computed graph, mass conservation,
    // and determinism. Top-20 output keeps the row set stable; 6
    // supersteps suffice for a stable top-20 ordering on this graph
    // (each superstep costs one dst-keyed shuffle of the edge list —
    // the honest unit cost of distributed graph iteration).
    "graph_pagerank" -> Q(
      (s, dir) => {
        pageRank(tradeEdges(s, dir), iters = 6)
          .select(col("node"), round(col("rank"), 10).as("rank"))
          .orderBy(col("rank").desc, col("node"))
          .limit(20)
      },
      None),

    // ------------------------------------------------------------------
    // Degree distribution of the same graph — the non-iterative
    // sanity twin, fully oracled: degree per node, then node count
    // per degree.
    "graph_degrees" -> Q(
      (s, dir) => {
        tradeEdges(s, dir)
          .groupBy("src").agg(count(lit(1)).as("degree"))
          .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
          .orderBy("degree")
      },
      Some("""
        WITH pairs AS (
          SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        sym AS (SELECT src, dst FROM pairs
                UNION ALL SELECT dst, src FROM pairs),
        deg AS (SELECT src, count(*) AS degree FROM sym GROUP BY src)
        SELECT degree, count(*) AS n_nodes FROM deg
        GROUP BY degree ORDER BY degree""")),

    // ------------------------------------------------------------------
    // Multi-source BFS distances on the trading graph, sources = the
    // first 20 customers that traded, 3 hops. EXACT (hop counts, not
    // ranks), so it oracles against DuckDB's recursive CTE — UNION
    // (not UNION ALL) recursion keeps the working set to distinct
    // (node, dist) rows, the same dedup-per-frontier the Spark side's
    // anti join performs. Output is the per-distance layer profile
    // (count + key checksum), which pins every node's distance
    // without emitting 10k+ node rows.
    "graph_shortest_path" -> Q(
      (s, dir) => {
        val edges = tradeEdges(s, dir)
        val sources = edges.select(col("src").as("node"))
          .filter(col("node") <= 20).distinct()
        shortestPaths(edges, sources, maxDepth = 3)
          .groupBy("dist")
          .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("node_sum"))
          .orderBy("dist")
      },
      Some("""
        WITH RECURSIVE pairs AS (
          SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        sym AS (SELECT src, dst FROM pairs
                UNION ALL SELECT dst, src FROM pairs),
        bfs(node, dist) AS (
          SELECT DISTINCT src AS node, 0 AS dist FROM sym WHERE src <= 20
          UNION
          SELECT s.dst, b.dist + 1 FROM bfs b
          JOIN sym s ON s.src = b.node WHERE b.dist < 3),
        best AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
        SELECT dist, count(*) AS n_nodes,
               CAST(sum(node) AS BIGINT) AS node_sum
        FROM best GROUP BY dist ORDER BY dist"""))
  )
}
