package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  // 4-node directed graph: 1->2, 2->3, 3->1, 3->2, 4->1, 1->4
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (4L, 1L), (1L, 4L))
    .toDF("src", "dst")

  /** The same recurrence, computed in plain Scala. */
  private def reference(iters: Int, d: Double): Map[Long, Double] = {
    val out = Map(1L -> Seq(2L, 4L), 2L -> Seq(3L), 3L -> Seq(1L, 2L),
      4L -> Seq(1L))
    val n = 4
    var r = Map(1L -> 0.25, 2L -> 0.25, 3L -> 0.25, 4L -> 0.25)
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[Long, BigDecimal]()
        .withDefaultValue(BigDecimal(0))
      for ((s, ds) <- out; t <- ds) {
        // mirror the engine's scale-12 rounding of rank/degree
        val c = BigDecimal(r(s) / ds.length)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        contrib(t) = contrib(t) + c
      }
      r = (1L to 4L).map(v =>
        v -> ((1 - d) / n + d * contrib(v).toDouble)).toMap
    }
    r
  }

  test("pagerank matches the hand recurrence on a 4-node graph") {
    val got = Graph.pageRank(edges, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = reference(6, 0.85)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
  }

  test("pagerank conserves rank mass and is deterministic") {
    val a = Graph.pageRank(edges.repartition(1), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(edges.repartition(7), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "pagerank not partition-invariant")
    assert(math.abs(a.values.sum - 1.0) < 1e-6,
      s"rank mass not conserved: ${a.values.sum}")
  }

  test("trade-graph pagerank returns ranked rows at sf0.001") {
    val df = graft.SparkEntry.registry("graph_pagerank").fn(spark, sf)
    val rows = df.collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x >= y },
      "not sorted by rank")
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
