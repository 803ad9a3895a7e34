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
}
