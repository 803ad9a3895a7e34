package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.UniqUpTo
import org.apache.spark.sql.functions._

/** Semantics of the statistical-aggregate group (Stats.scala) and the
  * round-3 additions, pinned on hand-computed inputs independent of
  * the DuckDB oracle.
  */
class StatsSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  test("histogram-selection quantiles agree with Spark's percentile()") {
    // ch_mad / ch_quantiles replaced the buffering percentile() with
    // rank selection over the cumulative cent histogram; the two
    // formulations must agree to interpolation rounding (the integer
    // path computes (a+b)/2 where percentile computes
    // lower + (higher-lower)*frac — sub-ulp apart, never more)
    val got = graft.SparkEntry.registry("ch_quantiles").fn(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ref = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.9))).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == ref.keySet)
    for (k <- got.keySet; (a, b) <- got(k).zip(ref(k)))
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"quantile mismatch for $k: $a vs $b")
    val mad = graft.SparkEntry.registry("ch_mad").fn(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    for ((k, qs) <- got) // median column must agree across operators
      assert(math.abs(mad(k)._1 - qs(1)) <= 1e-9 * qs(1),
        s"ch_mad median disagrees with ch_quantiles p50 for $k")
    // Independent MAD reference: the oracle replays the SAME histogram
    // formulation, so a shared error in the deviation-selection step
    // would pass both it and the median checks above. percentile() of
    // abs(price - med) is a formulation-independent witness. Tolerance
    // half a cent: the histogram path selects over exact integer cents
    // while the float path can flip near-ties by an ulp of 0.01.
    val medDf = mad.toSeq.map { case (k, (med, _)) => (k, med) }
      .toDF("l_returnflag", "med")
    val madRef = graft.Tables.lineitem(spark, sf)
      .join(broadcast(medDf), Seq("l_returnflag"))
      .withColumn("dev", abs(col("l_extendedprice") - col("med")))
      .groupBy("l_returnflag")
      .agg(percentile(col("dev"), lit(0.5)).as("madp"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, (_, madGot)) <- mad)
      assert(math.abs(madGot - madRef(k)) <= 0.005,
        s"ch_mad deviation-median disagrees with percentile MAD for $k: " +
          s"$madGot vs ${madRef(k)}")
  }

  test("uniqUpTo is exact below the cap and saturates at N+1 above it") {
    val df = (1 to 100).map(i => ("many", i.toLong)) ++
      Seq.fill(50)(("few", 7L)) ++ (1 to 3).map(i => ("three", i.toLong))
    val got = df.toDF("g", "x")
      .groupBy("g").agg(UniqUpTo(col("x"), 10).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("many") === 11L) // 100 distinct, cap 10 -> sentinel 11
    assert(got("few") === 1L)
    assert(got("three") === 3L)
  }

  test("uniqUpTo merge is order-insensitive and saturation absorbs") {
    // 1 partition per row forces reduce+merge across many partial buffers
    val df = (1L to 25L).map(("g", _)).toDF("g", "x").repartition(25)
    val u = df.groupBy("g").agg(UniqUpTo(col("x"), 20).as("u"))
      .collect().head.getLong(1)
    assert(u === 21L)
    val exact = df.groupBy("g").agg(UniqUpTo(col("x"), 30).as("u"))
      .collect().head.getLong(1)
    assert(exact === 25L)
  }

  test("entropy: uniform distribution gives log2(k), constant gives 0") {
    val ev = (Seq.tabulate(8)(i => (1L, s"t${i % 4}")) ++ // uniform over 4
      Seq.fill(5)((2L, "only"))) // single type
      .toDF("user_id", "event_type")
    ev.createOrReplaceTempView("ent_in")
    val counts = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .withColumn("tot", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
    val p = col("n").cast("double") / col("tot")
    val got = counts.withColumn("term", p * log(p) / log(lit(2.0)))
      .groupBy("user_id").agg(round(-sum(col("term")), 6).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 2.0) // log2(4)
    assert(got(2L) === 0.0 || got(2L) === -0.0)
  }

  test("ch_stats correlation is in [-1, 1] and stddev matches Spark's") {
    val rows = graft.SparkEntry.registry("ch_stats").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val ref = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(stddev_pop(col("l_quantity")).as("sd")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (r <- rows) {
      val corr = r.getAs[Double]("corr")
      assert(corr >= -1.0 && corr <= 1.0)
      // exact-moment stddev agrees with Spark's builtin to float tolerance
      assert(math.abs(r.getAs[Double]("stddev_qty") - ref(r.getString(0))) < 1e-6)
    }
  }

  test("ch_moving_sum arrays are per-customer order-length with 3-frame sums") {
    val rows = graft.SparkEntry.registry("ch_moving_sum").fn(spark, sf)
      .limit(50).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      // portable scalar output: the array is %.6f-formatted + joined
      val mv = r.getString(r.fieldIndex("moving_sums")).split(",").map(_.toDouble)
      assert(mv.length === r.getAs[Long]("n_orders"))
      // moving sums are bounded by 3x the max single window element
      assert(mv.forall(_ > 0))
    }
  }

  test("binned interval join reproduces the naive range self-join") {
    val got = graft.SparkEntry.registry("q_interval_join_binned")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = Tables.events(spark, sf)
      .filter(col("event_type") === "error").select("event_id", "ts_us")
    val naive = e.toDF("id_a", "ta")
      .crossJoin(e.toDF("id_b", "tb"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("ta") - col("tb")) <= 600000000L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
  }

  test("binned interval join plans as an equi join, not a nested loop") {
    val p = graft.SparkEntry.registry("q_interval_join_binned")
      .fn(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join fell back to a quadratic plan:\n$p")
  }

  test("txt_chunk_dedup flags planted cross-doc duplicate chunks") {
    val common = "alpha beta gamma delta epsilon" // one shared 5-chunk
    val docs = Seq(
      (1L, s"$common zeta eta theta iota kappa"),
      (2L, s"$common one two three four five"),
      (3L, "u v w x y z q r s t")).toDF("doc_id", "text")
    val k = 5
    val toks = split(regexp_replace(trim(lower(col("text"))), " +", " "), " ")
    val chunks = docs.select(col("doc_id"), toks.as("toks"))
      .withColumn("nc", (size(col("toks")) / k).cast("int"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, nc - 1), i -> concat_ws(' ', slice(toks, i * $k + 1, $k)))"))
        .as("chunk"))
    val freq = chunks.groupBy("chunk")
      .agg((min(col("doc_id")) < max(col("doc_id"))).as("dup"))
    val got = chunks.join(freq, Seq("chunk")).groupBy("doc_id")
      .agg(count(when(col("dup"), 1)).as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 0L)
  }

  test("emb_centroid: centroid of a label equals the elementwise mean") {
    val rows = graft.SparkEntry.registry("emb_centroid").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val dim = Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).head().getInt(0)
    for (r <- rows)
      assert(r.getString(r.fieldIndex("centroid")).split(",").length === dim)
    // spot-check one label against a direct computation (output is the
    // scale-6 HALF_UP-rounded mean, so tolerance is half an ulp of 1e-6)
    val lab = rows.head.getAs[Int]("label")
    val vecs = Tables.embeddings(spark, sf)
      .filter(col("label") === lab)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(v => math.round(v.toDouble * 1e6) / 1e6))
    val mean0 = vecs.map(_.head).sum / vecs.length
    val got0 = rows.head.getString(rows.head.fieldIndex("centroid"))
      .split(",").head.toDouble
    assert(math.abs(mean0 - got0) <= 5.01e-7)
  }

  test("ch_grouparray_sorted arrays are bounded at 5 and ascending") {
    val rows = graft.SparkEntry.registry("ch_grouparray_sorted").fn(spark, sf)
      .limit(100).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val a = r.getString(r.fieldIndex("low5")).split(",").map(_.toDouble).toSeq
      assert(a.length <= 5 && a == a.sorted)
    }
  }

  test("q_limit_ties has no window and matches the rank-filter reference") {
    val df = graft.SparkEntry.registry("q_limit_ties").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"q_limit_ties must not plan any WindowExec (global-rank scale trap):\n$plan")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice").desc)
    val ref = Tables.orders(spark, sf)
      .withColumn("rnk", rank().over(w).cast("int"))
      .filter(col("rnk") <= 10)
      .select(col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got === ref)
  }

  test("salted two-stage distinct equals the plain distinct aggregation") {
    val got = graft.SparkEntry.registry("q_salted_agg").fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === plain)
  }

  test("null-safe join keeps a broadcast hash join plan") {
    val p = graft.SparkEntry.registry("q_null_safe_join").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"null-safe join lost hash plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("dynamic partition overwrite touches only the patched partition") {
    graft.SparkEntry.registry("sink_dynamic_overwrite").fn(spark, sf).collect()
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_dynover_" +
      sf.replaceAll("[^A-Za-z0-9]", "_")
    val months = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("o_month=")).map(_.getName).sorted
    assert(months.contains("o_month=1995-06") && months.length > 10)
  }
}
