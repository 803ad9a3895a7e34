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
}
