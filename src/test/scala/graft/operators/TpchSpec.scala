package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Plan-shape audits for the TPC-H completion batch: each of these
  * queries has a well-known scale trap, and the test pins the plan
  * that avoids it.
  */
class TpchSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.registry(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("q04 EXISTS decorrelates to a semi join keyed on orderkey") {
    val p = plan("q04_order_priority")
    assert(p.contains("LeftSemi"), s"no semi join in q04 plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q04 planned a product join:\n$p")
  }

  test("q19 OR-of-ANDs plans a hash join, not a nested loop") {
    val p = plan("q19_brand_or")
    assert(p.contains("BroadcastHashJoin"), s"q19 lost its equi key:\n$p")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"q19 fell into a product join:\n$p")
  }

  test("q17 correlated AVG evaluates once per part (two aggregates, no re-scan per row)") {
    val p = plan("q17_small_qty_revenue")
    // per-part avg + final sum, each with partial/final stages
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"q17 missing the decorrelated per-part aggregate:\n$p")
    assert(!p.contains("CartesianProduct"), s"q17 planned a product:\n$p")
  }

  test("q21 lateness audit runs on ONE extra shuffle (per-order aggregate)") {
    val p = plan("q21_waiting_supplier")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q21 planned a product join:\n$p")
  }

  test("q22 scalar average is a broadcast, not a per-row recompute") {
    val p = plan("q22_idle_customers")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"q22 scalar should arrive by broadcast:\n$p")
    // anti join for NOT EXISTS
    assert(p.contains("LeftAnti"), s"q22 lost the anti join:\n$p")
  }

  test("q15 max-revenue reuses the quarterly aggregate for both sides") {
    val df = SparkEntry.registry("q15_top_supplier").fn(spark, sf)
    assert(df.count() >= 1)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"q15 planned a product:\n$p")
  }

  test("tpch completion queries all return rows at sf0.001") {
    for (q <- Seq("q04_order_priority", "q07_volume_shipping",
        "q08_market_share", "q12_late_lines", "q13_custdist",
        "q14_promo_revenue", "q15_top_supplier", "q17_small_qty_revenue",
        "q18_large_orders", "q19_brand_or", "q21_waiting_supplier",
        "q22_idle_customers", "q02_min_cost_supplier", "q11_important_parts",
        "q16_supplier_relationship", "q20_dominant_supplier"))
      assert(SparkEntry.registry(q).fn(spark, sf).count() > 0, s"$q empty")
  }

  test("q02 per-part MIN decorrelates: no product join, dims broadcast") {
    val p = plan("q02_min_cost_supplier")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q02 planned a product join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q02 part/supplier dims should broadcast:\n$p")
  }

  test("q11 global-scalar HAVING arrives by broadcast, evaluated once") {
    val p = plan("q11_important_parts")
    // the (total, npart) scalar is a 1-row side: broadcast NL join is
    // the right plan for it; the per-part aggregate must still be
    // partial+final hash aggregation
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"q11 scalar should arrive by broadcast:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"q11 missing partial aggregation stages:\n$p")
  }

  test("q16 excluded suppliers are a broadcast anti join") {
    val p = plan("q16_supplier_relationship")
    assert(p.contains("LeftAnti"), s"q16 lost the NOT IN anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"q16 planned a product:\n$p")
  }

  test("q20 share filter joins two aggregates of ONE scan, then semi-joins") {
    val p = plan("q20_dominant_supplier")
    assert(p.contains("LeftSemi"), s"q20 lost the IN semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q20 planned a product join:\n$p")
  }
}
