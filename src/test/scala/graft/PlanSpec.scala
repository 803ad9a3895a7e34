package graft

/** Explain-plan audits: the physical plans must keep the properties
  * that make these queries viable at 100 TB — filters reaching the
  * parquet scan, column pruning, broadcast joins for dimensions, and
  * map-side partial aggregation.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.registry(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("src_parquet pushes the filter into the scan and prunes columns") {
    val p = plan("src_parquet")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"no pushed filter in:\n$p")
    assert(!p.contains("l_extendedprice"), "scan reads pruned-away columns")
  }

  test("q06 scan-filter query pushes all range predicates") {
    val p = plan("q06_forecast_revenue")
    val pushedLine = p.linesIterator.find(_.contains("PushedFilters:")).getOrElse("")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushedLine.contains(c), s"$c not pushed: $pushedLine")
  }

  test("star joins broadcast their dimension sides") {
    for (q <- Seq("q03_shipping_priority", "q05_revenue_by_nation",
        "q09_profit_by_nation_year")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q has no broadcast join:\n$p")
    }
  }

  test("month-partitioned layout prunes partitions on a month filter") {
    import org.apache.spark.sql.functions._
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_prune_test"
    sources.Sink.writePartitionedSorted(Tables.orders(spark, sf), out,
      "o_month" -> date_format(col("o_orderdate"), "yyyy-MM"), Seq("o_custkey"))
    val read = spark.read.parquet(out).filter(col("o_month") === "1996-03")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("o_month"),
      s"no partition pruning:\n$p")
    assert(read.count() > 0)
  }

  test("sorted layout + parquet row-group stats prune a selective scan") {
    import org.apache.spark.sql.functions._
    // CH's primary-key skip index, Spark-native: sort the layout by
    // the lookup key and parquet's per-row-group min/max stats skip
    // row groups the pushed filter excludes. Tiny block size forces
    // many row groups even at test SF.
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_rowgroup_test"
    Tables.orders(spark, sf).repartition(1).sortWithinPartitions("o_custkey")
      .write.mode("overwrite").option("parquet.block.size", 16 * 1024)
      .parquet(out)
    val df = spark.read.parquet(out).filter(col("o_custkey") === 42)
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val read = scan.metrics("numOutputRows").value
    val total = spark.read.parquet(out).count()
    assert(read > 0, "lookup key missing from test data")
    assert(read < total / 2,
      s"row-group stats did not prune: scan read $read of $total rows")
  }

  test("bucket-key equality filter prunes to one bucket") {
    val p = plan("src_bucket_pruning")
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"no bucket pruning in:\n$p")
  }

  test("q01 aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), s"q01 not hash-aggregated:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final aggregation stages")
  }

  test("grouping sets plan is a single Expand + one aggregation pass") {
    val p = plan("q_grouping_sets")
    assert(p.contains("Expand"), s"no Expand in grouping-sets plan:\n$p")
    // one pass over the source: exactly one scan of the orders table
    assert("Scan parquet".r.findAllIn(p).size <= 2, // orders + customer
      s"grouping sets re-scans inputs:\n$p")
  }

  test("set operations plan as semi/anti joins, not row explosion") {
    assert(plan("q_intersect").contains("LeftSemi"),
      "INTERSECT should plan as a left-semi join")
    assert(plan("q_except").contains("LeftAnti"),
      "EXCEPT should plan as a left-anti join")
  }

  test("src_agg_pushdown answers count/min/max from parquet footers") {
    val p = plan("src_agg_pushdown")
    assert(p.contains("PushedAggregation") && p.contains("COUNT(*)"),
      s"aggregate not pushed to the parquet scan:\n$p")
  }

  test("dictionary lookups and the contamination holdout broadcast") {
    for (q <- Seq("ch_dictget", "txt_contamination")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q has no broadcast join:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q shuffles a side that should broadcast:\n$p")
    }
  }

  test("stratified sample is a pure scan-filter (no shuffle before the sort)") {
    val p = plan("txt_stratified_sample")
    // the only exchange allowed is the final presentation orderBy
    assert(!p.contains("HashAggregate"), s"sample plan aggregates:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"sample shuffles more than the presentation sort:\n$p")
  }

  test("ball-bound embedding pairs never plan a cartesian product") {
    val p = SparkEntry.registry("dedup_embedding_ivf").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"embedding pairs degenerated to a cartesian product:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"admissible cell-pair list should broadcast:\n$p")
  }

  test("every GLOBAL window in the registry sits above a domain-bounded input") {
    // An unpartitioned Window is a single-partition sort of its whole
    // input — fine over a post-aggregation frame whose cardinality is
    // domain-bounded (deciles, an hour calendar, top-20 pairs), fatal
    // over an n-row table at 100 TB. The r10 audit verified by hand
    // that every such window in the tree is post-agg; this guard makes
    // that property structural: a refactor that drops the aggregation
    // under any registry query's global window fails here, not in
    // production. Bounded = an Aggregate or a GlobalLimit somewhere
    // below the window in the OPTIMIZED logical plan (a Window above
    // another checked Window chains to the same bounded base).
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Deduplicate, GlobalLimit, LogicalPlan, Window => LWindow}
    def bounded(p: LogicalPlan): Boolean = p.collectFirst {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _: Deduplicate => true
    }.nonEmpty
    var seen = 0
    val offenders = SparkEntry.registry.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val lp = q.fn(spark, sf).queryExecution.optimizedPlan
        lp.collect {
          case w: LWindow if w.partitionSpec.isEmpty =>
            seen += 1
            if (bounded(w.child)) None
            else Some(s"$name: global window over un-aggregated input " +
              s"(orderBy ${w.orderSpec.map(_.sql).mkString(", ")})")
        }.flatten
    }
    info(s"$seen global windows audited across the registry")
    assert(seen > 0,
      "sweep found NO global windows — the collect pattern has drifted " +
        "from Catalyst's Window node (ch_with_fill et al. have them)")
    assert(offenders.isEmpty,
      s"global windows over unbounded inputs:\n${offenders.mkString("\n")}")
  }
}
