package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // 4-node directed graph: 1->2, 2->3, 3->1, 3->2, 4->1, 1->4
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (4L, 1L), (1L, 4L))
    .toDF("src", "dst")

  /** The same fixed-point recurrence, computed in plain Scala longs. */
  private def reference(iters: Int): Map[Long, Long] = {
    val out = Map(1L -> Seq(2L, 4L), 2L -> Seq(3L), 3L -> Seq(1L, 2L),
      4L -> Seq(1L))
    val n = 4
    val baseU = (3L * Graph.RankUnit) / (20L * n)
    var r = (1L to 4L).map(_ -> Graph.RankUnit / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((s, ds) <- out; t <- ds)
        contrib(t) += r(s) / ds.length // integer truncation, as the engine
      r = (1L to 4L).map(v => v -> (baseU + (17L * contrib(v)) / 20L)).toMap
    }
    r
  }

  test("pagerank matches the hand recurrence on a 4-node graph") {
    val got = Graph.pageRank(edges, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(6)
    assert(got == want, s"$got vs $want")
  }

  test("pagerank conserves rank mass and is deterministic") {
    val a = Graph.pageRank(edges.repartition(1), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(edges.repartition(7), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "pagerank not partition-invariant")
    // fixed-point truncation only ever LOSES mass, and very little:
    // sum(rank_u) <= RankUnit with a deficit bounded by a few units
    // per node per step
    val mass = a.values.sum
    assert(mass <= Graph.RankUnit, s"mass grew: $mass")
    assert(Graph.RankUnit - mass < 1000L * 4 * 5,
      s"rank mass lost beyond truncation bound: $mass")
  }

  test("dangling-node pagerank redistributes mass cell-exactly (arbitrary edge lists)") {
    // 1->2, 2->3, 3 has NO out-edges: the case the registry graph
    // avoids by symmetrizing. Node set must become src ∪ dst.
    val dangle = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")

    // hand recurrence with uniform dangling redistribution, same
    // integer truncation order as the engine
    def ref(iters: Int): Map[Long, Long] = {
      val out = Map(1L -> Seq(2L), 2L -> Seq(3L))
      val n = 3
      val baseU = (3L * Graph.RankUnit) / (20L * n)
      var r = (1L to 3L).map(_ -> Graph.RankUnit / n).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        for ((s, ds) <- out; t <- ds) contrib(t) += r(s) / ds.length
        val danglingShare = r(3L) / n
        r = (1L to 3L).map(v =>
          v -> (baseU + (17L * (contrib(v) + danglingShare)) / 20L)).toMap
      }
      r
    }
    val got = Graph.pageRank(dangle, iters = 5, redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref(5), s"$got vs ${ref(5)}")

    // mass conserved up to truncation (non-negative, tiny deficit)
    val mass = got.values.sum
    assert(mass <= Graph.RankUnit)
    assert(Graph.RankUnit - mass < 1000L * 3 * 5,
      s"dangling redistribution lost mass beyond truncation: $mass")

    // and WITHOUT the flag the same graph visibly drains mass — the
    // documented hazard the flag exists for (node 3 is not even in
    // the node set, and its inflow mass vanishes each step)
    val drained = Graph.pageRank(dangle, iters = 5)
      .collect().map(_.getLong(1)).sum
    assert(drained < Graph.RankUnit * 3 / 4,
      s"expected visible drain without redistribution, got $drained")

    // partition invariance holds on the dangling path too
    val b = Graph.pageRank(dangle.repartition(5), iters = 5,
      redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == got)
  }

  test("trade-graph pagerank returns ranked rows at sf0.001") {
    val df = graft.SparkEntry.registry("graph_pagerank").fn(spark, sf)
    val rows = df.collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x >= y },
      "not sorted by rank")
    // rank is exactly the closing division of the integer unit count
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1) / 1e12)
    }
  }

  test("pagerank broadcast is size-gated: hint below threshold, shuffle-only-ranks above") {
    // the gate itself: a 4-node ranks frame fits any sane threshold;
    // a billion-node one exceeds the default 10MB (32 B/row)
    assert(Graph.ranksBroadcastable(spark, 4L))
    assert(!Graph.ranksBroadcastable(spark, 1000000000L))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!Graph.ranksBroadcastable(spark, 4L),
        "threshold -1 (broadcasts disabled) must gate the hint off")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // both superstep-join regimes, on a persisted (src-partitioned)
    // edge index exactly as pageRank builds it
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.persist(lvl)
    val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist(lvl)
    eDeg.count(): Unit // materialize so the scan reports partitioning
    val ranks = e.select(col("src").as("node")).distinct()
      .withColumn("rank_u", lit(Graph.RankUnit / 4))
    // assert on the physical node tree (collect does not descend into
    // the cached eDeg BUILD plan, which legitimately broadcast at this
    // scale); AQE off so the superstep plan is final at planning time
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // below the gate: ranks rides a broadcast, edge index never moves
      val bPlan = Graph.contributionJoin(eDeg, ranks, broadcastRanks = true)
        .queryExecution.executedPlan
      assert(bPlan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"no BHJ:\n$bPlan")
      // above the gate: NO broadcast anywhere; the join is shuffle-hash
      // and the persisted eDeg side needs no new exchange
      val sPlan = Graph.contributionJoin(eDeg, ranks, broadcastRanks = false)
        .queryExecution.executedPlan
      assert(sPlan.collect { case b: BroadcastExchangeExec => b }.isEmpty,
        s"gated-off superstep still broadcasts:\n$sPlan")
      assert(sPlan.collect { case j: ShuffledHashJoinExec => j }.size == 1,
        s"no SHJ:\n$sPlan")
      // exactly two shuffles: the ranks side into the join + the
      // dst-keyed aggregation. A third would mean the persisted
      // (src-partitioned) edge index was re-shuffled.
      val nEx = sPlan.collect { case e: ShuffleExchangeExec => e }.size
      assert(nEx == 2,
        s"expected 2 exchanges (ranks, dst agg), got $nEx:\n$sPlan")
      // both regimes compute the same mass flow
      val b = Graph.contributionJoin(eDeg, ranks, broadcastRanks = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val s2 = Graph.contributionJoin(eDeg, ranks, broadcastRanks = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(b == s2 && b.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      eDeg.unpersist(blocking = false)
      e.unpersist(blocking = false): Unit
    }
  }

  test("shortestPaths computes exact hop distances with a depth cap") {
    // chain 10-11-12-13-14 plus a shortcut 10->13, symmetrized
    val raw = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (10L, 13L))
      .toDF("src", "dst")
    val sym = raw.unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
    val sources = Seq(10L).toDF("node")
    val got = Graph.shortestPaths(sym, sources, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 12 is reachable in 2 both via 11 and via 13 — distance must be
    // the MIN, and 14 (dist 2 via the shortcut) must be found even
    // though the chain route is 4 hops
    assert(got == Map(10L -> 0, 11L -> 1, 13L -> 1, 12L -> 2, 14L -> 2))

    // depth 1 stops at the frontier: no dist-2 nodes
    val d1 = Graph.shortestPaths(sym, sources, maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d1 == Map(10L -> 0, 11L -> 1, 13L -> 1))
  }
}
