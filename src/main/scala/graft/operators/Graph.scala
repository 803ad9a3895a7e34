package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph compute in the Spark idiom: each superstep is one
  * keyed join + one aggregation (contributions shuffled by dst) and
  * the driver holds no graph state. Rank is FIXED-POINT: a BIGINT
  * count of 1e-12 units of rank mass, so every superstep is integer
  * div + integer sum — bit-identical under any partitioning AND any
  * engine (the "keep the statistic integer" device; this is what
  * lets the driver oracle an iterative operator cell-exactly).
  */
object Graph {

  /** One unit of rank mass = 1e-12 (rank resolution). */
  val RankUnit: Long = 1000000000000L

  /** Conservative on-wire bytes per ranks row (node: long, rank_u:
    * long, plus row overhead) used by the broadcast gate below.
    */
  private val RanksRowBytes = 32L

  /** Whether an n-node ranks frame fits under Spark's broadcast
    * threshold. PageRank's superstep join is broadcast-hinted ONLY
    * when this holds: at billion-node graphs the ranks side exceeds
    * the broadcast ceiling and an unconditional hint would fail every
    * superstep outright — past the gate the join degrades to a
    * shuffle-hash join that moves the node-count ranks side, never
    * the persisted (already src-partitioned) edge index.
    */
  private[graft] def ranksBroadcastable(s: SparkSession, n: Long): Boolean =
    SizeGate.fits(s, n, RanksRowBytes)

  /** The superstep contribution join under the size gate — the one
    * plan decision that changes between a test-scale and a
    * billion-node graph. Broadcast regime: ranks ships to every
    * executor, the edge index never moves. Shuffle regime: the
    * shuffle_hash hint (build = ranks) exchanges ONLY the node-count
    * ranks rows; eDeg's persisted src-partitioning satisfies the
    * join's distribution requirement with no new exchange, and no
    * per-superstep sort is paid (vs sort-merge).
    */
  private[graft] def contributionJoin(eDeg: DataFrame, ranks: DataFrame,
      broadcastRanks: Boolean): DataFrame = {
    val r = if (broadcastRanks) broadcast(ranks) else ranks.hint("shuffle_hash")
    eDeg.join(r, col("src") === col("node"))
      .select(col("dst"), expr("rank_u div deg").as("c"))
      .groupBy("dst").agg(sum(col("c")).as("mass_in"))
  }

  /** PageRank over an edge list, damping d = dNum/dDen (default
    * 17/20 = 0.85). Output is (node, rank_u, rank): `rank_u` the
    * exact integer unit count, `rank` its value via one closing
    * division. Mass is conserved up to integer truncation: RankUnit -
    * sum(rank_u) is tiny and non-negative (spec'd).
    *
    * Dangling nodes (no out-edges): with `redistributeDangling =
    * false` (registry default) callers must pass edges where every
    * node has out-degree > 0 (e.g. symmetrized, as [[tradeEdges]]
    * does) or their rank mass silently drains. With `true` the
    * operator is safe on ARBITRARY edge lists: the node set becomes
    * src ∪ dst and each superstep redistributes the danglings' mass
    * uniformly — ONE extra scalar aggregate per superstep over
    * node-count rows (a driver-side long, same cost class as the
    * per-step checkpoint), never an extra edge-list shuffle.
    */
  def pageRank(edges: DataFrame, iters: Int = 10,
      dNum: Int = 17, dDen: Int = 20,
      redistributeDangling: Boolean = false,
      edgeParts: Option[Int] = None): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // ONE edge-sized resident: the src-partitioned plain edge list.
    // Degree is loop-invariant but NODES-sized, so it lives on its
    // own small table and attaches to the RANKS side each superstep —
    // the earlier design persisted a (src, dst, deg) edge index
    // BESIDE the raw list it derived from, and at the sf100 rung the
    // two ~26 GB residents (plus build shuffles) overflowed the
    // host's disk three times. Every loop invariant below derives
    // FROM eSrc's cached, already-src-partitioned blocks: the degree
    // aggregate and the src-distinct plan with no new exchange.
    // r13 (guide §2: scale-adaptive partitioning): the edge-index
    // partition count defaults to spark.sql.shuffle.partitions, but a
    // caller that knows the input size passes edgeParts derived from
    // it — every superstep stage schedules that many tasks, and a
    // constant 32 on a megabyte-scale graph spends more wall-clock on
    // task scheduling than on edges (6 supersteps x 2 stages x 32
    // near-empty tasks).
    val eSrc = edgeParts
      .map(p => edges.repartition(p, col("src")))
      .getOrElse(edges.repartition(col("src"))).persist(lvl)
    val degTable = eSrc.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(lvl)
    // r13: the node table CARRIES deg for the whole loop. Without
    // danglings the src-distinct set IS degTable's key set, so `nodes`
    // is a free projection of the already-persisted degree table (the
    // former separate distinct cost one more setup shuffle + persist +
    // count); and keeping deg on the checkpointed ranks rows removes
    // the per-superstep ranks-deg join (one join + one broadcast build
    // per superstep at any scale — deg is loop-invariant per node).
    val nodes = (if (redistributeDangling)
        eSrc.select(col("src").as("node"))
          .unionByName(eSrc.select(col("dst").as("node"))).distinct()
          .join(degTable.withColumnRenamed("src", "node"), Seq("node"), "left")
      else degTable.select(col("src").as("node"), col("deg"))).persist(lvl)
    // loop-invariant dangling set: nodes with no out-edge (empty when
    // the caller guarantees none — the anti join is then planned away
    // at node-count cost once, not per step)
    val dangling =
      if (redistributeDangling)
        nodes.select("node").join(
          eSrc.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti").persist(lvl)
      else null
    val n = nodes.count()
    if (dangling != null) dangling.count(): Unit
    // SIZE-GATE the per-superstep broadcasts once, on the measured
    // node count: below the threshold ranks/contribs ship as
    // broadcasts (edge index never moves); above it both joins run
    // shuffle-hash over node-count rows — eSrc and nodes are
    // persisted already hash-partitioned on their join keys, so the
    // only data moved per superstep is still O(nodes), never O(edges)
    val bcast = ranksBroadcastable(edges.sparkSession, n)
    // (1-d)/n in units, truncated — the teleport mass per node
    val baseU = ((dDen - dNum) * RankUnit) / (dDen * n)
    var ranks = nodes.withColumn("rank_u", lit(RankUnit / n))
    // superstep i's checkpoint blocks are dead the moment superstep
    // i+1's checkpoint materializes — unpersist them explicitly
    // instead of waiting for a GC the big bench heap may never run
    // (the LAST checkpoint stays: the returned frame's lineage ends
    // at it and a localCheckpoint cannot recompute)
    var prevCkpt: DataFrame = null
    try {
      for (_ <- 1 to iters) {
        // dangling mass this step: one scalar over node-count rows;
        // its per-node share joins the damped flow as a literal
        val danglingShareU: Long =
          if (redistributeDangling)
            ranks.join(dangling, Seq("node"))
              .agg(coalesce(sum("rank_u"), lit(0L))).head.getLong(0) / n
          else 0L
        // ranks is node-count rows — the contribution join must never
        // shuffle the (much larger) edge index; the only per-superstep
        // shuffle over edges is the dst-keyed contribution aggregation
        // (map-side partial sum first). Degree rides ON the ranks rows
        // (loop-invariant, attached once at setup), so no per-superstep
        // deg join exists. See contributionJoin for the two regimes.
        val contribs = contributionJoin(eSrc, ranks, bcast)
        ranks = nodes.join(
            if (bcast) broadcast(contribs) else contribs.hint("shuffle_hash"),
            col("node") === col("dst"), "left")
          .select(col("node"), col("deg"),
            (lit(baseU) + expr(
              s"($dNum * (coalesce(mass_in, CAST(0 AS BIGINT)) + " +
                s"CAST($danglingShareU AS BIGINT))) div $dDen"))
              .as("rank_u"))
        // cut the lineage each step, EAGERLY: a deferred checkpoint
        // lets superstep N's recompute stack onto N+1's first action
        // (measured 2x on this loop); eager pins each step to one
        // materialization of node-count rows
        ranks = ranks.localCheckpoint(eager = true)
        if (prevCkpt != null)
          org.apache.spark.sql.GraftBenchShim.unpersistLocalCheckpoint(prevCkpt)
        prevCkpt = ranks
      }
      ranks = ranks
        .select(col("node"), col("rank_u")) // deg was loop plumbing
        .withColumn("rank", col("rank_u") / lit(1e12))
        .persist(lvl)
      ranks.count(): Unit // materialize before unpersists
      ranks
    } finally {
      eSrc.unpersist(blocking = false)
      degTable.unpersist(blocking = false)
      if (dangling != null) dangling.unpersist(blocking = false)
      nodes.unpersist(blocking = false): Unit
    }
  }

  /** One PageRank superstep's un-executed plan, for PlanAudit: the
    * contribution join + dst-keyed aggregation exactly as the loop
    * builds it (ranks at the initial uniform value). The full
    * operator checkpoints per step, so its final plan hides the
    * superstep shape this exposes.
    */
  def pageRankSuperstepPlan(s: SparkSession, dir: String): DataFrame = {
    val eSrc = tradeEdges(s, dir).repartition(col("src"))
    val degTable = eSrc.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = eSrc.select(col("src").as("node")).distinct()
    val ranks = nodes.withColumn("rank_u", lit(RankUnit / 1000))
      .join(degTable.withColumnRenamed("src", "node"), Seq("node"))
    contributionJoin(eSrc, ranks,
      broadcastRanks = ranksBroadcastable(s, 1000L))
  }

  /** Scale-adaptive edge-index partition count (guide §2): sized from
    * the corpus's lineitem parquet bytes (~8 MB of source per
    * partition — the symmetrized pair index inflates ~2-3x in memory),
    * so superstep task counts grow with the data instead of pinning to
    * the session constant. r14 (verdict #2): the count is FLOORED at
    * the session's default parallelism — the r13 floor of 1 ran every
    * superstep's edge side as a single task at bench SFs (lineitem
    * 10.8 MB => 1 partition), a driver-measured 2x regression on
    * graph_shortest_path and an 8-core-beats-32 inversion on all
    * three graph loops. Upward scale-adaptivity is unchanged (the
    * floor only binds when bytes/8MB < cores). Returns None (callers
    * fall back to the session-default repartition) if the file size
    * is unreadable.
    */
  private[graft] def edgePartsFor(s: SparkSession, dir: String): Option[Int] =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")
      val bytes = p.getFileSystem(s.sessionState.newHadoopConf())
        .getContentSummary(p).getLength
      val floor = s.sparkContext.defaultParallelism.toLong
      Some(math.min(math.max(floor, bytes / (8L << 20)), 1L << 20).toInt)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Customer<->supplier trading graph: an edge per distinct
    * (customer, supplier) pair that traded, symmetrized (so no node
    * dangles and the chain is irreducible). Supplier ids are offset
    * into their own namespace.
    *
    * r14 (guide §2.4 remove shuffles/passes): symmetrization is an
    * EXPLODE of each pair into its two directions, not a union of the
    * pair subtree with its flipped self — Spark re-inlines multiply-
    * referenced subtrees, so the union form computed the
    * orders-join-lineitem + distinct ONCE PER BRANCH (2x the
    * dominant setup cost in every consumer; graph_degrees paid it
    * twice more via its own reference). Same output multiset: each
    * distinct pair emits exactly (src,dst) and (dst,src).
    */
  def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + 10000000L).as("p"))
      .distinct()
      .select(explode(array(
        struct(col("c").as("src"), col("p").as("dst")),
        struct(col("p").as("src"), col("c").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Multi-source BFS: hop distance from `sources` to every node
    * within `maxDepth` hops. Classic frontier iteration in the Spark
    * idiom — each superstep is one (frontier JOIN edges) shuffle plus
    * an anti join against the visited set; the frontier only ever
    * holds NEW nodes, so total work is O(edges x depth) worst case
    * and the driver holds no graph state. Lineage is cut per step
    * (localCheckpoint) exactly as in [[pageRank]].
    */
  def shortestPaths(edges: DataFrame, sources: DataFrame, maxDepth: Int,
      edgeParts: Option[Int] = None): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val s = edges.sparkSession
    // r13: same scale-adaptive edge partitioning as pageRank — the raw
    // tradeEdges union carries 2x the session partition count, so every
    // hop's expansion join scheduled ~64 near-empty tasks at bench SFs.
    val e = edgeParts.map(p => edges.repartition(p, col("src")))
      .getOrElse(edges).persist(lvl)
    var visited = sources.select(col("node"), lit(0).as("dist"))
      .localCheckpoint(eager = true)
    var frontier = visited
    // the frontier can grow to node count — size-gate its broadcast
    // per step (same gate as pageRank's ranks side): below the
    // threshold the expansion join broadcasts and the edge list never
    // moves; past it, shuffle-hash moves the frontier rows only (the
    // persisted edge list satisfies its side from cache). The count
    // doubles as the emptiness check (frontier is checkpointed, so
    // it's a metadata-cheap job).
    var frontierN = frontier.count()
    try {
      var d = 0
      while (d < maxDepth && frontierN > 0) {
        d += 1
        val fr = if (ranksBroadcastable(s, frontierN)) broadcast(frontier)
          else frontier.hint("shuffle_hash")
        val next = fr.join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("dist", lit(d))
          .localCheckpoint(eager = true)
        // r13: `visited` stays a LAZY union of the per-hop checkpointed
        // layers — union is a no-shuffle concatenation, every leaf is
        // already materialized, so re-checkpointing the whole visited
        // set each hop (node-count rows re-materialized per step, plus
        // an unpersist) bought nothing. Layer checkpoints stay alive
        // until the loop ends; the returned frame reads the same union.
        visited = visited.unionByName(next)
        frontier = next
        frontierN = next.count()
      }
      // r14 (advice): the layer checkpoints must outlive this call
      // (the returned union reads them) — register the result so the
      // NEXT invocation frees them instead of leaking per call.
      graft.CkptSlot.swap("shortest_paths_visited", visited)
    } finally e.unpersist(blocking = false): Unit
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // PageRank on the trading graph — CELL-EXACTLY oracled despite
    // being iterative: fixed-point integer rank units make every
    // superstep pure integer arithmetic, so DuckDB replays the same
    // 6 supersteps (unrolled CTEs below) to identical bigints. Top-20
    // output keeps the row set stable; each superstep costs one
    // dst-keyed shuffle of the edge list — the honest unit cost of
    // distributed graph iteration. GraphSpec additionally pins a
    // hand-computed graph, mass conservation, and determinism.
    "graph_pagerank" -> Q(
      (s, dir) => {
        pageRank(tradeEdges(s, dir), iters = 6,
          edgeParts = edgePartsFor(s, dir))
          .select(col("node"), col("rank_u"), col("rank"))
          .orderBy(col("rank_u").desc, col("node"))
          .limit(20)
      },
      Some {
        val prelude = """
        WITH pairs AS (
          SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        sym AS (SELECT src, dst FROM pairs
                UNION ALL SELECT dst, src FROM pairs),
        deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
        edeg AS (SELECT s.src, s.dst, d.deg
                 FROM sym s JOIN deg d ON s.src = d.src),
        nodes AS (SELECT DISTINCT src AS node FROM sym),
        nn AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT node,
                 1000000000000 // (SELECT n FROM nn) AS rank_u
               FROM nodes)"""
        // one CTE per superstep: same integer recurrence as pageRank
        val steps = (1 to 6).map { i =>
          s"""r$i AS (
          SELECT nd.node,
            (3 * 1000000000000) // (20 * (SELECT n FROM nn))
              + (17 * coalesce(m.mass_in, 0)) // 20 AS rank_u
          FROM nodes nd LEFT JOIN (
            SELECT e.dst, CAST(SUM(r.rank_u // e.deg) AS BIGINT) AS mass_in
            FROM edeg e JOIN r${i - 1} r ON e.src = r.node
            GROUP BY e.dst) m ON m.dst = nd.node)"""
        }.mkString(",\n", ",\n", "")
        prelude + steps + """
        SELECT CAST(node AS BIGINT) AS node,
               CAST(rank_u AS BIGINT) AS rank_u,
               CAST(rank_u AS BIGINT) / 1e12 AS rank
        FROM r6 ORDER BY rank_u DESC, node LIMIT 20"""
      }),

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
        // r14: sources == "custkeys <= 20 with at least one traded
        // pair" — derived straight from orders (PushedFilters:
        // o_custkey <= 20) + a lineitem semi join, instead of
        // filtering the FULL symmetrized edge build (which re-ran the
        // orders-lineitem join + distinct just to pick 20 nodes;
        // supplier ids live at +1e7 so src <= 20 never matches them).
        val sources = Tables.orders(s, dir)
          .filter(col("o_custkey") <= 20)
          .join(Tables.lineitem(s, dir),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_custkey").as("node")).distinct()
        shortestPaths(edges, sources, maxDepth = 3,
          edgeParts = edgePartsFor(s, dir))
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
