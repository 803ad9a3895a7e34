package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("bucketed fact-fact join plans without a join-side shuffle") {
    val (ot, lt) = Bucketing.ensureOrdersLineitem(spark, sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(ot)
        .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketsFor sizes bucket count to the data, pow-2, floored and capped") {
    assert(Bucketing.bucketsFor(0) == 16)
    assert(Bucketing.bucketsFor(600000) == 16)       // sf0.1 keeps its layout
    assert(Bucketing.bucketsFor(16L * 250000) == 16) // pow-2 FLOOR of want
    assert(Bucketing.bucketsFor(32L * 250000) == 32)
    assert(Bucketing.bucketsFor(100L * 250000) == 64)
    assert(Bucketing.bucketsFor(10000000000L) == 4096) // 100 TB cap
  }

  test("windowFunnel depth distribution is sane and matches a recompute") {
    val rows = SparkEntry.registry("ch_windowfunnel").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val depths = rows.map(_.getInt(1))
    assert(depths.forall(d => d >= 0 && d <= 3))
  }

  test("approx quantiles satisfy the GK rank guarantee per group") {
    val rows = SparkEntry.registry("ch_quantiles_approx").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 2 to 5)
      assert(r.getBoolean(i),
        s"${r.getString(0)}: quantile rank check $i failed (n=${r.getLong(1)})")
  }

  test("salted join returns exactly the rows of the plain join") {
    val left = Seq.tabulate(1000)(i => (if (i < 900) 1L else i.toLong, i))
      .toDF("k", "payload") // 90% of rows share key 1 — heavy skew
    val right = Seq((1L, "hot"), (950L, "cold"), (999L, "tail")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", 8, col("payload"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 902)
  }
  test("ch_lttb matches a naive quadratic LTTB reference, keeps endpoints, is deterministic") {
    // independent reference: the textbook O(n * nOut) selection over
    // the same integer geometry (no shared code with Lttb.fold)
    def reference(xs: Seq[(Long, Long)], nOut: Int): Seq[Int] = {
      val n = xs.length; val nb = nOut - 2
      def bucket(k: Int): Seq[Int] =
        (1 until n - 1).filter(i => ((i - 1).toLong * nb) / (n - 2) == k)
      var prev = 0
      val sel = Seq.newBuilder[Int]
      sel += 0
      for (k <- 0 until nb) {
        val cand = bucket(k)
        val anchor: (BigInt, BigInt, BigInt) =
          if (k == nb - 1) (BigInt(1), BigInt(xs(n - 1)._1), BigInt(xs(n - 1)._2))
          else {
            val nxt = bucket(k + 1)
            (BigInt(nxt.size), nxt.map(i => BigInt(xs(i)._1)).sum,
              nxt.map(i => BigInt(xs(i)._2)).sum)
          }
        val (c, sx, sy) = anchor
        val (px, py) = (BigInt(xs(prev)._1), BigInt(xs(prev)._2))
        val best = cand.maxBy { i =>
          val a = ((px * c - sx) * (BigInt(xs(i)._2) - py)
            - (px - BigInt(xs(i)._1)) * (sy - py * c)).abs
          (a, BigInt(-i)) // max area, tie -> smallest index
        }
        sel += best; prev = best
      }
      sel += (n - 1)
      sel.result()
    }
    // a 12-point zig-zag series, one synthetic group, nOut=5
    val pts = Seq(
      (0L, 10.00), (60L, 55.25), (120L, 12.50), (180L, 8.75),
      (240L, 99.00), (300L, 42.00), (360L, 41.75), (420L, 3.10),
      (480L, 77.77), (540L, 12.00), (600L, 13.25), (660L, 50.00))
    val df = pts.zipWithIndex.map { case ((t, v), id) =>
      ("zig", id.toLong, t * 1000000L, v)
    }.toDF("event_type", "event_id", "ts_us", "value")
    val got = Lttb.downsample(df, nOut = 5).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val xs = pts.map { case (t, v) =>
      (t * 1000000L, BigDecimal(v).setScale(4).*(100).toLongExact) }
    val want = reference(xs, 5).zipWithIndex.map { case (i, seq) =>
      (seq, pts(i)._1 * 1000000L, pts(i)._2) }
    assert(got == want, s"got=$got\nwant=$want")
    // registry shape on the real corpus: 20 points per event_type,
    // endpoints kept, every point a real series row, deterministic
    val out = SparkEntry.registry("ch_lttb").fn(spark, sf).collect()
    val groups = out.groupBy(_.getString(0))
    val ev = Tables.events(spark, sf)
      .select("event_type", "ts_us", "value").collect()
      .groupBy(_.getString(0))
    for ((g, rows) <- groups) {
      assert(rows.length == 20, s"$g: ${rows.length} points")
      val seqs = rows.map(_.getInt(1)).sorted.toSeq
      assert(seqs == (0 until 20), s"$g: seqs $seqs")
      val series = ev(g).map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(rows.forall(r => series.contains((r.getLong(2), r.getDouble(3)))),
        s"$g: selected a point not in the series")
      val ts = ev(g).map(_.getLong(1))
      val byseq = rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      assert(byseq.head == ts.min && byseq.last == ts.max,
        s"$g: endpoints not kept")
      assert(byseq == byseq.sorted, s"$g: selection not time-ordered")
    }
    val again = SparkEntry.registry("ch_lttb").fn(spark, sf).collect()
    assert(again.map(_.toString).toSeq == out.map(_.toString).toSeq)
  }

  test("ch_lttb passes short series (n <= nOut) through unchanged") {
    // CH's largestTriangleThreeBuckets returns a series with fewer
    // points than the budget verbatim; mix short (4 pts), boundary
    // (exactly nOut pts) and long (12 pts) series in one frame
    val mk = (g: String, pts: Seq[(Long, Double)]) =>
      pts.zipWithIndex.map { case ((t, v), id) =>
        (g, id.toLong, t * 1000000L, v) }
    val tiny = Seq((0L, 1.0), (60L, 9.0), (120L, 2.0), (180L, 7.0))
    val edge = Seq((0L, 5.0), (60L, 1.0), (120L, 8.0), (180L, 3.0),
      (240L, 6.0))
    val long = Seq(
      (0L, 10.00), (60L, 55.25), (120L, 12.50), (180L, 8.75),
      (240L, 99.00), (300L, 42.00), (360L, 41.75), (420L, 3.10),
      (480L, 77.77), (540L, 12.00), (600L, 13.25), (660L, 50.00))
    val df = (mk("tiny", tiny) ++ mk("edge", edge) ++ mk("long", long))
      .toDF("event_type", "event_id", "ts_us", "value")
    val out = Lttb.downsample(df, nOut = 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    // short + boundary: all points, in order, seq = index
    for ((g, pts) <- Seq("tiny" -> tiny, "edge" -> edge)) {
      val want = pts.zipWithIndex.map { case ((t, v), i) =>
        (g, i, t * 1000000L, v) }
      assert(out(g).sortBy(_._2).toSeq == want, s"$g not passed through")
    }
    // the long series still downsamples to exactly nOut points
    assert(out("long").length == 5 &&
      out("long").map(_._2).sorted.toSeq == (0 until 5))
  }
}
