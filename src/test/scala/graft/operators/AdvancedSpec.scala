package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics + plan shape of the Advanced group, pinned on
  * hand-computed inputs independent of the DuckDB oracle.
  */
class AdvancedSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  test("AUC rank statistic matches hand-computed separable/random cases") {
    // perfectly separable: every positive outranks every negative -> 1.0
    val sep = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1))
    // fully tied scores -> 0.5 exactly (average-rank tie handling)
    val tied = Seq((5.0, 0), (5.0, 0), (5.0, 1), (5.0, 1))
    def auc(rows: Seq[(Double, Int)]): Double = {
      val df = rows.toDF("score", "pos")
      val byScore = org.apache.spark.sql.expressions.Window.orderBy("score")
      val ties = org.apache.spark.sql.expressions.Window.partitionBy("score")
      df.withColumn("two_r",
          lit(2L) * rank().over(byScore) + count(lit(1)).over(ties) - 1L)
        .agg((sum(when(col("pos") === 1, col("two_r"))) -
          sum(col("pos")) * (sum(col("pos")) + 1L)).cast("double") /
          (lit(2L) * sum(col("pos")) *
            (count(lit(1)) - sum(col("pos")))).cast("double"))
        .collect().head.getDouble(0)
    }
    assert(auc(sep) === 1.0)
    assert(auc(tied) === 0.5)
    // one inversion among 2x2 -> 3 of 4 pairs correct
    assert(auc(Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1))) === 0.75)
  }

  test("Welch t-test: equal samples give t=0; known two-sample t matches") {
    val out = Advanced.all("ch_ttest").fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getDouble(3); val df = r.getDouble(4)
      assert(!t.isNaN && !df.isNaN)
      // df is bounded by n1 + n2 - 2 and at least min(n1, n2) - 1
      assert(df > 1.0 && df < (r.getLong(1) + r.getLong(2)).toDouble)
    }
    // hand case: x = {1,2,3} (var 1), y = {2,4,6} (var 4)
    // t = (2-4)/sqrt(1/3+4/3) = -2/sqrt(5/3)
    val n1 = 3.0; val v1 = 1.0; val v2 = 4.0
    val expT = (2.0 - 4.0) / math.sqrt(v1 / n1 + v2 / n1)
    val a = v1 / n1; val b = v2 / n1
    val expDf = (a + b) * (a + b) / (a * a / 2.0 + b * b / 2.0)
    assert(math.abs(expT - (-1.5491933384829668)) < 1e-12)
    assert(expDf > 2.0 && expDf < 4.0)
  }

  test("interval union length merges overlaps and counts islands") {
    // user 1: [0,30) [10,40) [100,130) -> busy 70, 2 islands
    // user 2: [0,30) [30,60) -> touching intervals merge (st > maxEnd is
    // strict), busy 60, 1 island
    val us = 60000000L // one minute in micros
    val ev = Seq((1L, 0L), (1L, 10L), (1L, 100L), (2L, 0L), (2L, 30L))
      .map { case (u, m) => (u, m * us) }.toDF("user_id", "ts_us")
    val iv = ev.select(col("user_id"), col("ts_us").as("st"),
      (col("ts_us") + 30L * us).as("en"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("st")
    val prevMax = max(col("en"))
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val got = iv.withColumn("ni",
        when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "island")
      .agg(min("st").as("ist"), max("en").as("ien"))
      .groupBy("user_id")
      .agg(sum(col("ien") - col("ist")).as("busy"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((70L * us, 2L)))
    assert(got(2L) === ((60L * us, 1L)))
  }

  test("theta set-ops stay accurate after sketch overflow") {
    import graft.functions.Kmv
    val k = 512
    // |A| = 4000, |B| = 4000, |A ∩ B| = 2000, |A ∪ B| = 6000 — both
    // sketches saturate (8x overflow)
    val a = (1L to 4000L).toDF("x").repartition(8)
      .agg(Kmv.state(k, xxhash64(col("x")))).collect().head.getAs[Array[Byte]](0)
    val b = (2001L to 6000L).toDF("x").repartition(8)
      .agg(Kmv.state(k, xxhash64(col("x")))).collect().head.getAs[Array[Byte]](0)
    val (u, i) = Kmv.setOps(a, b, k)
    assert(math.abs(u - 6000.0) / 6000.0 < 0.15, s"union est $u")
    assert(math.abs(i - 2000.0) / 2000.0 < 0.25, s"intersect est $i")
    // unsaturated sketches are exact
    val (u2, i2) = Kmv.setOps(
      (1L to 100L).toDF("x").agg(Kmv.state(k, xxhash64(col("x"))))
        .collect().head.getAs[Array[Byte]](0),
      (51L to 150L).toDF("x").agg(Kmv.state(k, xxhash64(col("x"))))
        .collect().head.getAs[Array[Byte]](0), k)
    assert(u2 === 150L && i2 === 50L)
  }

  test("oriented edge-join counts each triangle exactly once (K4 = 4)") {
    // complete graph on 4 vertices, edges oriented low -> high
    val e = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)).toDF("u", "v")
    e.createOrReplaceTempView("k4_e")
    val n = spark.sql("""
      SELECT count(*) AS t FROM k4_e e1
      JOIN k4_e e2 ON e1.v = e2.u
      JOIN k4_e e3 ON e1.u = e3.u AND e2.v = e3.v""").collect().head.getLong(0)
    assert(n === 4L)
    val got = Advanced.all("graph_triangles").fn(spark, sf).collect().head
    assert(got.getLong(0) > 0 && got.getLong(2) > 0) // vertices, triangles
  }

  test("lateral top-2 per nation equals the window formulation") {
    val lateral = Advanced.all("q_lateral_join").fn(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val expect = graft.Tables.customer(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(graft.Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal")
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_custkey"))
    assert(lateral.collect().toSeq === expect.collect().toSeq)
  }

  test("z-order layout prunes a box query better than a 1-d sort") {
    import graft.sources.Zorder
    val base = graft.Tables.lineitem(spark, sf)
    val tdir = System.getProperty("java.io.tmpdir")
    val zout = s"$tdir/graft_ztest_z"; val sout = s"$tdir/graft_ztest_s"
    base.withColumn("z", Zorder.interleave(col("l_partkey"), col("l_suppkey")))
      .repartition(1).sortWithinPartitions("z").drop("z")
      .write.mode("overwrite").option("parquet.block.size", 16 * 1024)
      .parquet(zout)
    base.repartition(1).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").option("parquet.block.size", 16 * 1024)
      .parquet(sout)
    // wide partkey range x narrow suppkey range: the 1-d partkey sort
    // cannot skip on suppkey, the z-order layout can
    def rowsRead(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("l_partkey") > 0 && col("l_suppkey").between(2, 3))
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    val (zr, sr) = (rowsRead(zout), rowsRead(sout))
    assert(zr > 0 && sr > 0)
    assert(zr < sr, s"z-order read $zr rows, 1-d sort read $sr")
    // morton interleave sanity: (1,0) -> 1, (0,1) -> 2, (3,3) -> 15
    val m = Seq((1, 0), (0, 1), (3, 3)).toDF("a", "b")
      .select(Zorder.interleave(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(m === Seq(1L, 2L, 15L))
  }

  test("sample quantile: exact below k, close and deterministic above") {
    import graft.functions.SampleQuantile
    // exact regime: 100 rows, k = 4096 -> sample is the whole group
    val small = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val exact = small.agg(SampleQuantile(4096, Seq(0.5, 0.9),
      xxhash64(col("id")), col("v"))).collect().head.getSeq[Double](0)
    assert(exact(0) === 50.5) // percentile_cont(0.5) over 1..100
    assert(math.abs(exact(1) - 90.1) < 1e-9)
    // overflow regime: 50k rows, k = 1024 -> uniform-sample estimate
    val big = (1 to 50000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .repartition(16)
    val est = big.agg(SampleQuantile(1024, Seq(0.5), xxhash64(col("id")),
      col("v"))).collect().head.getSeq[Double](0).head
    assert(math.abs(est - 25000.0) / 25000.0 < 0.10, s"median est $est")
    // determinism under different partitioning
    val est2 = big.repartition(3).agg(SampleQuantile(1024, Seq(0.5),
      xxhash64(col("id")), col("v"))).collect().head.getSeq[Double](0).head
    assert(est === est2, "bottom-k sample must be partition-invariant")
  }

  test("hinted join plans as ShuffledHashJoin; reuse plan has a reused stage") {
    val shj = Advanced.all("q_shuffle_hash_join").fn(spark, sf)
    shj.collect()
    assert(shj.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "SHUFFLE_HASH hint did not produce a shuffled hash join")
    val re = Advanced.all("q_reused_exchange").fn(spark, sf)
    re.collect()
    val p = re.queryExecution.executedPlan.toString
    assert(p.contains("Reused"),
      s"expected a ReusedExchange/ReusedQueryStage in:\n$p")
  }

  test("merge applies update/delete/insert clauses to disjoint key sets") {
    val rows = Advanced.all("sink_merge").fn(spark, sf).collect()
    val byStatus = rows.groupBy(_.getString(2))
    assert(byStatus.keySet === Set("kept", "updated", "inserted"))
    // deleted keys: matched (had 1995 spend) and % 89 == 0 — absent
    val keys = rows.map(_.getLong(0)).toSet
    val updated = byStatus("updated").map(_.getLong(0))
    assert(updated.forall(k => k % 89 != 0))
    // inserts live in their own key namespace
    assert(byStatus("inserted").forall(_.getLong(0) >= 10000000L))
    assert(keys.size === rows.length, "merge output must be key-unique")
  }

  test("manifest-pruned read opens fewer files than the layout holds") {
    val df = Advanced.all("src_manifest_prune").fn(spark, sf)
    assert(df.count() > 0)
    val layout = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_" +
      sf.replaceAll("[^A-Za-z0-9]", "_")
    val total = spark.read.parquet(layout).inputFiles.length
    val pruned = df.inputFiles.length
    assert(total === 8, s"expected the 8-file z-order layout, found $total")
    assert(pruned > 0 && pruned < total,
      s"manifest should prune the $total-file layout, read $pruned")
  }

  test("AQE splits a planted skewed join partition (skew=true)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key carrying ~95% of the left side; the payload is
      // per-row unique (shuffle sizes are COMPRESSED — a constant
      // payload would deflate the hot partition below any threshold)
      val left = ((1 to 60000).map(_ => 1L) ++ (1 to 3000).map(_ % 50 + 2L))
        .zipWithIndex
        .map { case (k, i) => (k, s"payload-$i-${i * 2654435761L}") }
        .toDF("k", "v")
      val right = (1L to 60L).map((_, "dim")).toDF("k", "d")
      // global agg only (a keyed consumer would require hash
      // distribution and veto OptimizeSkewedJoin); count(v) keeps the
      // payload column alive through the shuffle
      val j = left.join(right, "k").agg(count(col("v")))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join handling in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("q_dpp plan prunes fact partitions dynamically from the dim side") {
    val df = Advanced.all("q_dpp").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter in:\n$plan")
    assert(df.count() > 0)
  }

  test("Mann-Whitney U matches a plain-Scala tie-averaged-rank recompute") {
    // independent oracle: collect the (flag, quantity) pairs (6k rows
    // at sf0.001) and recompute U and z with naive sorted ranks
    val rows = graft.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("A", "N"))
      .select(col("l_returnflag"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val pooled = rows.sortBy(_._2)
    // 2x average rank per tie group (odd integers — exact in Long)
    val rank2 = scala.collection.mutable.Map[Double, Long]()
    var i = 0
    while (i < pooled.length) {
      var j = i
      while (j < pooled.length && pooled(j)._2 == pooled(i)._2) j += 1
      rank2(pooled(i)._2) = (i + 1).toLong + j.toLong // 2*avg of [i+1, j]
      i = j
    }
    val n1 = rows.count(_._1 == "A").toLong
    val n2 = rows.count(_._1 == "N").toLong
    val r1x2 = rows.filter(_._1 == "A").map(r => rank2(r._2)).sum
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val ties = rank2.keys.toSeq.map { v =>
      val t = rows.count(_._2 == v).toLong; t * t * t - t
    }.sum
    val (n1d, n2d, nd) = (n1.toDouble, n2.toDouble, (n1 + n2).toDouble)
    val expZ = (u1x2.toDouble - n1d * n2d) /
      (2.0 * math.sqrt(n1d * n2d / 12.0 *
        ((nd + 1.0) - ties.toDouble / (nd * (nd - 1.0)))))
    val out = Advanced.all("ch_mann_whitney").fn(spark, sf).collect().head
    assert(out.getLong(0) === n1 && out.getLong(1) === n2)
    assert(out.getLong(2) === u1x2)
    assert(math.abs(out.getDouble(3) - expZ) < 1e-12)
    // U1 + U2 = n1*n2 pins the rank-sum bookkeeping
    assert(u1x2 >= 0 && u1x2 <= 2 * n1 * n2)
  }

  test("Spearman rank correlation matches naive Pearson-on-ranks; " +
    "fact side joins the rank dims broadcast") {
    val df = Advanced.all("ch_rank_corr").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rank dims should join broadcast:\n$plan")
    val got = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def avgRanks(vs: Seq[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1.0).sum / g.size) }
    }
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val rx = avgRanks(rs.map(_._2).toSeq); val ry = avgRanks(rs.map(_._3).toSeq)
      val xs = rs.map(r => rx(r._2)); val ys = rs.map(r => ry(r._3))
      val n = rs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      val rho = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      val (gotN, gotRho) = got(g)
      assert(gotN === rs.length.toLong)
      assert(math.abs(gotRho - rho) < 1e-9, s"group $g: $gotRho vs $rho")
    }
  }
}
