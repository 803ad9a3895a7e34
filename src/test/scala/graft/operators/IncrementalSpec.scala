package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.sources.Sink
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  test("kmv is exact below k and within 5% at 40x overflow") {
    // exact range: 200 distinct < k=256
    val small = (1L to 200L).toSeq.toDF("x")
      .agg(graft.functions.Kmv(256, xxhash64(col("x"))))
      .head.getLong(0)
    assert(small == 200L, s"kmv not exact below k: $small")
    // forced overflow: 10,000 distinct >> k=256
    val big = (1L to 10000L).toSeq.toDF("x")
      .agg(graft.functions.Kmv(256, xxhash64(col("x"))))
      .head.getLong(0)
    assert(math.abs(big - 10000.0) / 10000.0 < 0.10,
      s"kmv estimate off by >10%: $big vs 10000")
  }

  test("t-digest merge law: shard-merge == recompute, both within the rank bound") {
    import graft.functions.TDigestSketch
    val comp = 200
    // a skewed continuous domain no cent histogram can index: x^2 on
    // a deterministic pseudo-random stream, plus a heavy point mass
    val n = 50000
    val xs = (0 until n).map { i =>
      val h = ((i * 2654435761L) ^ (i >>> 3)) & 0xffffffL
      val u = h.toDouble / 0x1000000L.toDouble
      if (i % 10 == 0) 42.0 else u * u * 1e6
    }
    val exact = xs.sorted.toArray
    // with duplicates a value occupies a RANK INTERVAL [count(<v),
    // count(<=v)]; the estimate's rank error is its distance from the
    // target rank to that interval (0 when the target lands inside)
    def rankInterval(v: Double): (Int, Int) =
      (exact.count(_ < v), exact.count(_ <= v))
    def rankErr(v: Double, q: Double): Double = {
      val (lo, hi) = rankInterval(v)
      val t = q * n
      if (t < lo) lo - t else if (t > hi) t - hi else 0.0
    }
    // one digest over the whole stream vs a merge of 8 shard digests
    // (the AggregatingMergeTree MV shape: per-part states merged at
    // read). Build both through the Aggregator's own reduce/merge.
    val agg = new TDigestSketch.Agg(comp, Nil)
    def digestOf(vals: Seq[Double]): Array[Byte] =
      vals.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val whole = digestOf(xs)
    val merged = xs.grouped(math.ceil(n / 8.0).toInt).toSeq
      .map(digestOf).reduce(agg.merge)
    // state stays bounded by the compression budget in both shapes
    assert(TDigestSketch.pairsOf(whole).length / 2 <= 4 * comp)
    assert(TDigestSketch.pairsOf(merged).length / 2 <= 4 * comp)
    val eps = 3.0 * n / comp // the documented k0 bound
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99);
         (name, d) <- Seq("whole" -> whole, "merged" -> merged)) {
      val est = TDigestSketch.quantile(
        TDigestSketch.pairsOf(d).toIndexedSeq, q)
      val err = rankErr(est, q)
      assert(err <= eps,
        f"$name q=$q: rank error $err%.0f > bound $eps%.0f (est=$est%.3f)")
    }
    // merge == recompute WITHIN THE BOUND (not bit-equal: merge order
    // legitimately moves centroids; the law is that both digests
    // answer every quantile within the same error budget — asserted
    // above — so their estimates' rank intervals lie within 2x of it)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val a = TDigestSketch.quantile(TDigestSketch.pairsOf(whole).toIndexedSeq, q)
      val b = TDigestSketch.quantile(TDigestSketch.pairsOf(merged).toIndexedSeq, q)
      val (aLo, aHi) = rankInterval(a); val (bLo, bHi) = rankInterval(b)
      val gap = math.max(0, math.max(aLo - bHi, bLo - aHi))
      assert(gap <= 2 * eps, f"merge law: q=$q whole=$a merged=$b gap=$gap")
    }
    // the point-mass median: 10% of mass at 42.0 must be representable
    val p = TDigestSketch.quantile(TDigestSketch.pairsOf(merged).toIndexedSeq, 0.05)
    assert(p < 1e6, "point mass vanished from the sketch")
  }

  test("t-digest k1 scale: tail-sharpened rank bound holds at p50/p99/p999, incl. after shard merges") {
    import graft.functions.TDigestSketch
    val comp = 200
    // same skewed stream as the k0 law above
    val n = 50000
    val xs = (0 until n).map { i =>
      val h = ((i * 2654435761L) ^ (i >>> 3)) & 0xffffffL
      val u = h.toDouble / 0x1000000L.toDouble
      if (i % 10 == 0) 42.0 else u * u * 1e6
    }
    val exact = xs.sorted.toArray
    def rankErr(v: Double, q: Double): Double = {
      val lo = exact.count(_ < v); val hi = exact.count(_ <= v)
      val t = q * n
      if (t < lo) lo - t else if (t > hi) t - hi else 0.0
    }
    val agg = new TDigestSketch.Agg(comp, Nil, k1 = true)
    def digestOf(vals: Seq[Double]): Array[Byte] =
      vals.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val whole = digestOf(xs)
    val merged = xs.grouped(math.ceil(n / 8.0).toInt).toSeq
      .map(digestOf).reduce(agg.merge)
    assert(TDigestSketch.pairsOf(whole).length / 2 <= 4 * comp)
    assert(TDigestSketch.pairsOf(merged).length / 2 <= 4 * comp)
    // the documented k1 bound: 8π·√(q(1−q))·n/δ rank error (2x merge
    // factor + midpoint slack over the single-pass (2π/δ)√(q(1−q))
    // cluster width), floored at 4 rows of integer-rank granularity
    def bound(q: Double): Double =
      math.max(8 * math.Pi * math.sqrt(q * (1 - q)) / comp * n, 4.0)
    for (q <- Seq(0.5, 0.9, 0.99, 0.999);
         (name, d) <- Seq("whole" -> whole, "merged" -> merged)) {
      val est = TDigestSketch.quantile(
        TDigestSketch.pairsOf(d).toIndexedSeq, q)
      val err = rankErr(est, q)
      assert(err <= bound(q),
        f"$name q=$q: rank error $err%.0f > k1 bound ${bound(q)}%.0f (est=$est%.3f)")
    }
    // the reason k1 exists: its p99/p999 guarantee is strictly sharper
    // than the k0 bound at the same state size
    val k0Bound = 3.0 * n / comp
    assert(bound(0.99) < k0Bound && bound(0.999) < k0Bound / 3,
      "k1 tail bound is not sharper than k0's — scale function wrong")
  }

  test("kmv merge is order/partitioning-invariant and ignores nulls") {
    val df = ((1L to 500L).map(java.lang.Long.valueOf) :+ null)
      .toDF("x").withColumn("h",
        when(col("x").isNotNull, xxhash64(col("x"))))
    val a = df.repartition(1)
      .agg(graft.functions.Kmv(256, col("h"))).head.getLong(0)
    val b = df.repartition(13)
      .agg(graft.functions.Kmv(256, col("h"))).head.getLong(0)
    assert(a == b, s"kmv not merge-invariant: $a vs $b")
  }

  test("delete mutation rewrites ONLY partitions containing matches") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_delspec"
    Tables.orders(spark, sf)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("o_month").parquet(out)
    def fileSnapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified).toMap
    }
    val before = fileSnapshot()
    val affected = Sink.deleteWhere(spark, out, "o_month",
      col("o_orderdate") >= lit("1997-06-10").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-20").cast("timestamp"))
    assert(affected.toSet == Set("1997-06", "1997-07"),
      s"wrong affected set: $affected")
    val after = fileSnapshot()
    val untouchedBefore = before.filter(!_._1.contains("o_month=1997-0"))
    val untouchedAfter = after.filter(!_._1.contains("o_month=1997-0"))
    assert(untouchedBefore == untouchedAfter,
      "files outside affected partitions were rewritten")
    // and the delete actually removed the rows
    val survivors = spark.read.parquet(out)
      .filter(col("o_orderdate") >= lit("1997-06-10").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-20").cast("timestamp"))
    assert(survivors.count() == 0, "matching rows survived the delete")
  }

  test("update mutation rewrites ONLY partitions containing matches") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_updspec"
    Tables.orders(spark, sf)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("o_month").parquet(out)
    def fileSnapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified).toMap
    }
    val pred = col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
      col("o_orderdate") < lit("1997-08-01").cast("timestamp")
    val rowsBefore = spark.read.parquet(out).count()
    val matchTotalBefore = spark.read.parquet(out).filter(pred)
      .agg(sum(col("o_totalprice"))).head.getDouble(0)
    val before = fileSnapshot()
    val affected = Sink.updateWhere(spark, out, "o_month", pred,
      Seq("o_totalprice" -> (col("o_totalprice") * 2)))
    assert(affected == Seq("1997-07"), s"wrong affected set: $affected")
    val after = fileSnapshot()
    val untouchedBefore = before.filter(!_._1.contains("o_month=1997-07"))
    val untouchedAfter = after.filter(!_._1.contains("o_month=1997-07"))
    assert(untouchedBefore == untouchedAfter,
      "files outside the affected partition were rewritten")
    // row count preserved (update, not delete) and values doubled
    assert(spark.read.parquet(out).count() == rowsBefore)
    val matchTotalAfter = spark.read.parquet(out).filter(pred)
      .agg(sum(col("o_totalprice"))).head.getDouble(0)
    assert(math.abs(matchTotalAfter - 2 * matchTotalBefore) < 1e-6,
      s"expected doubled total, got $matchTotalAfter vs 2x$matchTotalBefore")
  }

  test("projection routing: plan scans the projection, not the base table") {
    val df = SparkEntry.registry("mv_route").fn(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_mvproj"), s"plan not routed to projection:\n$p")
    assert(!p.contains("orders.parquet"), s"plan still scans the base:\n$p")
    // and an aggregate the projection CANNOT answer stays on the base
    val un = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("u"))
    val up = un.queryExecution.executedPlan.toString
    assert(up.contains("orders.parquet"), s"underivable agg was routed:\n$up")
  }

  test("projection routing preserves grouping-subset reaggregation") {
    // projection keys are (priority, status); grouping by status alone
    // must still route and still be exact
    SparkEntry.registry("mv_route").fn(spark, sf) // ensures registration
    val routed = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(routed.queryExecution.executedPlan.toString.contains("graft_mvproj"))
    val expected = Tables.orders(spark, sf)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = routed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"routed subset-grouping differs: $got vs $expected")
  }

  test("delete mutation keeps rows where the predicate is NULL") {
    // SQL/CH DELETE WHERE removes rows where the predicate is TRUE;
    // a NULL evaluation (comparison against a NULL cell) must KEEP
    // the row, not silently drop it with the !pred rewrite.
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_delnull"
    Seq((1L, "a", java.lang.Double.valueOf(10.0)),
        (2L, "a", null.asInstanceOf[java.lang.Double]),
        (3L, "b", java.lang.Double.valueOf(5.0)))
      .toDF("id", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(out)
    val affected = Sink.deleteWhere(spark, out, "p", col("v") > 6.0)
    assert(affected == Seq("a"), s"wrong affected set: $affected")
    val left = spark.read.parquet(out)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(left == Set(2L, 3L),
      s"expected the NULL-predicate row (id=2) to survive, got $left")
  }

  test("projection self-evicts when the base table changes") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stalespec"
    val base = s"$dir/base_orders"
    val proj = s"$dir/graft_staleproj"
    Tables.orders(spark, sf).write.mode("overwrite").parquet(base)
    graft.plans.Projections.register(spark, base, proj,
      Seq("o_orderstatus"), Seq("o_totalprice" -> graft.Dec.D))
    def q() = spark.read.parquet(base)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(q().queryExecution.executedPlan.toString.contains("graft_staleproj"),
      "fresh projection not routed")
    // mutate the base AFTER registration: routing must stop, and the
    // answer must come from the (bigger) base, not the stale proj
    Tables.orders(spark, sf).limit(500)
      .write.mode("append").parquet(base)
    val afterAppend = q()
    assert(!afterAppend.queryExecution.executedPlan.toString
        .contains("graft_staleproj"),
      "stale projection still routed after base append")
    val expected = spark.read.parquet(base)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterAppend.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
    // re-register rebuilds against the new base and routes again
    graft.plans.Projections.register(spark, base, proj,
      Seq("o_orderstatus"), Seq("o_totalprice" -> graft.Dec.D))
    val rebuilt = q()
    assert(rebuilt.queryExecution.executedPlan.toString.contains("graft_staleproj"),
      "rebuilt projection not routed")
    assert(rebuilt.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == expected,
      "rebuilt projection answers differ from base recompute")
  }

  test("count of a NULL literal stays 0 under projection routing") {
    SparkEntry.registry("mv_route").fn(spark, sf) // ensures registration
    // SQL: count(NULL) = 0 on every group; the naive sum(n) rewrite
    // would return the group row count instead. (Spark's own
    // NullPropagation usually folds count(NULL) to literal 0 before
    // the rule sees it; the rewriteAgg non-null guard covers the
    // unfolded path. Either way the VALUES must be 0.)
    val q = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority").agg(count(lit(null)).as("c"))
    assert(q.collect().forall(_.getLong(1) == 0L), "count(NULL) != 0")
  }

  test("incremental MV refresh equals full recompute") {
    val mv = SparkEntry.registry("mv_incremental").fn(spark, sf)
    val full = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
    val got = mv.select("o_orderpriority", "n")
    assert(got.collect().toSeq == full.collect().toSeq,
      "merged increments differ from full recompute")
  }
}
