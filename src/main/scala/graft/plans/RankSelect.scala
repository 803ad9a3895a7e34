package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed per-group rank/running-total substrate.
  *
  * `Window.partitionBy(group).orderBy(...)` parallelizes only across
  * GROUPS — with a handful of group keys (ch_quantile_disc /
  * ch_equidepth partition orders by its 5 priority classes; the rank
  * window family partitions customer/part by nation/brand; shard
  * packing partitions documents by source) every row of a group
  * moves through ONE task, a parallelism ceiling the r13 sf100 rung
  * measured (~14.5x across the sf10→sf100 decade while the suite
  * median held ~7-12x: five tasks sorting 30M rows each while 315
  * partitions sat idle, plus single-task sort spill). The ceiling
  * caps ANY cluster at #groups cores, however many executors exist.
  *
  * None of these operators needs the per-group sort: a per-group
  * RUNNING TOTAL over a total order is computable with full
  * parallelism —
  *
  *   1. [[PrefixSum.cumsumLong]] over the order (group, order...):
  *      ONE range shuffle across ALL shuffle partitions + a bounded
  *      (numPartitions-row) driver collect — never a one-task sort.
  *   2. Per-group totals = a #groups-row aggregate folded into
  *      exclusive offsets on the DRIVER (bounded metadata, the
  *      DeltaLog-survivors precedent) and broadcast-joined back —
  *      so the operator plan carries NO WindowExec at all
  *      (PrefixSumSpec / TopKSpec assert it).
  *
  * From the per-group inclusive running total every rank statistic
  * follows as arithmetic: in-group rank (value = 1), the value at
  * rank r (prev < r <= cum over the count distribution), ntile's
  * fixed rank intervals, percent_rank/cume_dist's closing divisions,
  * byte-offset shard cuts (value = payload bytes).
  */
object RankSelect {

  /** Appends `cum` — the per-group INCLUSIVE running sum of long
    * column `value` over the total order `order` within `grp` — and
    * `n`, the group's total. `(grp +: order)` must be a total order
    * (make it unique with a key tiebreak, as with any cumulative
    * window); group keys must be non-null. No single-task window
    * anywhere: see object doc.
    */
  def groupedCumSum(df: DataFrame, grp: String, order: Seq[String],
      value: String): DataFrame = {
    val spark = df.sparkSession
    val g = PrefixSum.cumsumLong(df, grp +: order, Seq(value), Seq("gcum"))
    // exclusive group offsets in the SAME (ascending grp) order the
    // range shuffle used; #groups rows — bounded driver metadata
    val totals = df.groupBy(col(grp)).agg(sum(col(value)).as("n"))
      .orderBy(col(grp)).collect()
    var run = 0L
    val offRows = totals.map { r =>
      val row = Row(r.get(0), r.getLong(1), run); run += r.getLong(1); row
    }.toSeq
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(df.schema(grp),
        StructField("n", LongType, nullable = false),
        StructField("goff", LongType, nullable = false))))
    g.join(broadcast(offDf), Seq(grp))
      .withColumn("cum", col("gcum") - col("goff"))
      .drop("gcum", "goff")
  }

  /** Per-group inclusive cumulative count distribution of `v`:
    * returns (grp, v, cnt, n, cum, prev) where cnt is the count of
    * `v` in the group, n the group total, and (prev, cum] the
    * in-group 1-based rank interval the value occupies under
    * ascending `v` — the substrate for value-AT-rank selection
    * (ties collapse by value, exactly what any "value at rank"
    * statistic observes).
    */
  def groupedCumDist(df: DataFrame, grp: String, v: String): DataFrame =
    groupedCumSum(
      df.groupBy(col(grp), col(v)).agg(count(lit(1)).as("cnt")),
      grp, Seq(v), "cnt")
      .withColumn("prev", col("cum") - col("cnt"))

  /** In-group 1-based rank of every row under the unique order
    * `(order...)` within `grp`, as column `cum`, plus the group size
    * `n` — [[groupedCumSum]] of a constant 1. The substrate for the
    * rank window FUNCTION family (rank/ntile/percent_rank/cume_dist
    * over a tie-free order are pure arithmetic on (cum, n)).
    */
  def groupedRank(df: DataFrame, grp: String, order: Seq[String])
      : DataFrame = {
    val tagged = df.withColumn("graft_rs_one", lit(1L))
    groupedCumSum(tagged, grp, order, "graft_rs_one")
      .drop("graft_rs_one")
  }

  /** ntile(`buckets`) of in-group rank column `r` in a group of `n`
    * rows (both LONG column NAMES), as IntegerType — the uneven-split
    * rule (first n%buckets tiles get one extra row) as pure integer
    * arithmetic. The dead branch's div-by-zero (n < buckets) yields
    * NULL under SQL semantics and is never the selected branch.
    */
  def ntileExpr(r: String, n: String, buckets: Int)
      : org.apache.spark.sql.Column = expr(s"""
    CAST(CASE WHEN $r <= ($n div $buckets + 1) * ($n % $buckets)
      THEN ($r - 1) div ($n div $buckets + 1) + 1
      ELSE $n % $buckets
           + ($r - 1 - ($n div $buckets + 1) * ($n % $buckets))
             div ($n div $buckets) + 1
    END AS INT)""")
}
