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
