package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix-sum device: equivalence with the
  * single-partition cumulative window it replaces, across partition
  * counts (including partitions > rows, which forces empty ranges).
  */
class PrefixSumSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def reference(rows: Seq[(Long, Long, Long)]) = {
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.toDF("k", "x", "y")
      .withColumn("cx", sum("x").over(w))
      .withColumn("cy", sum("y").over(w))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
  }

  test("cumsumLong matches the window reference at several widths") {
    val rows = (1L to 1000L).map(k => (k * 7 % 1009, k % 13, k % 5))
      .map { case (k, x, y) => (k, x, y) }
    val df = rows.toDF("k", "x", "y").repartition(16) // scrambled input
    val want = reference(rows)
    for (p <- Seq(1, 4, 32, 2048)) { // 2048 > rows: empty ranges
      val got = PrefixSum
        .cumsumLong(df, Seq("k"), Seq("x", "y"), Seq("cx", "cy"), p)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
      assert(got === want, s"prefix sum diverges at $p partitions")
    }
  }

  test("ch_ks_test plans no WindowExec (single-partition scale trap)") {
    val plan = graft.SparkEntry.registry("ch_ks_test").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"ch_ks_test must use the distributed prefix sum, not a window:\n$plan")
  }

  test("ch_ks_test D statistic is in [0,1] and n1/n2 are the group sizes") {
    val r = graft.SparkEntry.registry("ch_ks_test").fn(spark, sf).head()
    val d = r.getAs[Double]("d")
    assert(d >= 0.0 && d <= 1.0)
    val counts = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.getAs[Long]("n1") === counts("A"))
    assert(r.getAs[Long]("n2") === counts("N"))
  }

  test("RankSelect.groupedCumDist matches the per-group window reference") {
    // 3 uneven groups with heavy value ties, scrambled input
    val rows = (1L to 2000L).map(k => (s"g${k % 3}", k * 7 % 83))
    val df = rows.toDF("g", "v").repartition(16)
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wg))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val gotRows = RankSelect.groupedCumDist(df, "g", "v").collect()
    val got = gotRows
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("cnt"),
        r.getAs[Long]("cum"))).toSet
    assert(got === want, "per-group cumulative diverges from the window")
    // prev/cum form a partition of 1..n per group
    val sizes = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    gotRows.foreach { r =>
      assert(r.getAs[Long]("prev") === r.getAs[Long]("cum") - r.getAs[Long]("cnt"))
      assert(r.getAs[Long]("n") === sizes(r.getString(0)))
    }
  }

  test("ch_quantile_disc / ch_equidepth: no WindowExec, equal to the window recompute") {
    // Plan property: both rank rows now run on the distributed
    // cumulative distribution (RankSelect) — the 5-key partitionBy
    // window was a parallelism ceiling the sf100 rung measured
    // (~14.5x/decade: five tasks sorting 30M rows each).
    for (q <- Seq("ch_quantile_disc", "ch_equidepth")) {
      val plan = graft.SparkEntry.registry(q).fn(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$q must rank-select over the distribution, not window:\n$plan")
    }
    val orders = graft.Tables.orders(spark, sf)
    // the ORIGINAL window formulations, inline, as references
    val wq = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wn = Window.partitionBy("o_orderpriority")
    def pick(p: Double) =
      max(when(col("rn") === ceil(col("n") * p),
        graft.Dec.d(col("o_totalprice")))).cast("double")
    val wantQd = orders
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(wq))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("o_orderpriority")
      .agg(pick(0.25).as("p25"), pick(0.5).as("p50"),
        pick(0.9).as("p90"), max(col("n")).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    val gotQd = graft.SparkEntry.registry("ch_quantile_disc")
      .fn(spark, sf).collect().toSeq
    assert(gotQd === wantQd, "quantile_disc diverges from window recompute")
    val wantEq = orders
      .withColumn("tile", ntile(4).over(wq))
      .groupBy("o_orderpriority", "tile")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy("o_orderpriority", "tile").collect().toSeq
    val gotEq = graft.SparkEntry.registry("ch_equidepth")
      .fn(spark, sf).collect().toSeq
    assert(gotEq === wantEq, "equidepth diverges from window recompute")
  }

  test("rank window family / shard pack: no WindowExec, equal to window recomputes") {
    for (q <- Seq("q_window_ntile", "q_window_ranks", "mm_shard_pack")) {
      val plan = graft.SparkEntry.registry(q).fn(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$q must use RankSelect, not a #groups-task window:\n$plan")
    }
    // q_window_ntile: original 25-key window formulation
    val wNt = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val wantNt = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(wNt).as("quartile"),
        percent_rank().over(wNt).as("pct_rank"),
        cume_dist().over(wNt).as("cume"))
      .orderBy("c_custkey").collect().toSeq
    val gotNt = graft.SparkEntry.registry("q_window_ntile")
      .fn(spark, sf).collect().toSeq
    assert(gotNt === wantNt, "q_window_ntile diverges from window recompute")
    // q_window_ranks: original formulation
    val wRk = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").asc, col("p_partkey").asc)
    val wantRk = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        rank().over(wRk).as("rnk"),
        dense_rank().over(wRk).as("drnk"),
        ntile(4).over(wRk).as("quartile"),
        percent_rank().over(wRk).as("prnk"),
        cume_dist().over(wRk).as("cdist"))
      .orderBy("p_partkey").collect().toSeq
    val gotRk = graft.SparkEntry.registry("q_window_ranks")
      .fn(spark, sf).collect().toSeq
    assert(gotRk === wantRk, "q_window_ranks diverges from window recompute")
    // mm_shard_pack: original running-offset window
    val wSp = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wantSp = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("start_off",
        coalesce(sum(col("n_chars")).over(wSp), lit(0L)))
      .withColumn("shard_id", expr("start_off div 4096"))
      .orderBy("source", "doc_id").collect().toSeq
    val gotSp = graft.SparkEntry.registry("mm_shard_pack")
      .fn(spark, sf).collect().toSeq
    assert(gotSp === wantSp, "mm_shard_pack diverges from window recompute")
  }
}
