package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed per-group rank selection substrate.
  *
  * `Window.partitionBy(group).orderBy(v)` parallelizes only across
  * GROUPS — with a handful of group keys (ch_quantile_disc /
  * ch_equidepth partition orders by its 5 priority classes) every
  * row of a group moves through ONE task, a parallelism ceiling the
  * r13 sf100 rung measured (the two rows ran ~14.5x across the
  * sf10→sf100 decade while the suite median held ~7-12x: five tasks
  * sorting 30M rows each while 315 partitions sat idle, plus
  * single-task sort spill). Exact rank statistics don't need the
  * per-row sort: the value at in-group rank r is a pure function of
  * the group's VALUE DISTRIBUTION, and the distribution's cumulative
  * form is computable with full parallelism —
  *
  *   1. groupBy(group, v) -> cnt: an ordinary parallel aggregate.
  *   2. [[PrefixSum.cumsumLong]] over the order (group, v): ONE range
  *      shuffle across ALL shuffle partitions + a bounded
  *      (numPartitions-row) driver collect — never a one-task sort.
  *   3. Per-group cumulative = global cumulative minus the group's
  *      exclusive offset — a #groups-row collect folded on the
  *      driver (bounded metadata, the DeltaLog-survivors precedent)
  *      and broadcast-joined back, so the operator plan carries NO
  *      WindowExec at all (PrefixSumSpec asserts it).
  *
  * The value at in-group rank r (1-based, ties collapsed by value —
  * exactly what any "value AT rank" statistic observes) is then the
  * row with prev < r <= cum, a broadcast lookup or a when() filter —
  * both embarrassingly parallel.
  */
object RankSelect {

  /** Per-group inclusive cumulative count distribution of `v`:
    * returns (grp, v, cnt, n, prev, cum) where cnt is the count of
    * `v` in the group, n the group total, and (prev, cum] the
    * in-group 1-based rank interval the value occupies under
    * ascending `v`. Group keys must be non-null. No single-task
    * window anywhere: see object doc.
    */
  def groupedCumDist(df: DataFrame, grp: String, v: String): DataFrame = {
    val spark = df.sparkSession
    val dist = df.groupBy(col(grp), col(v)).agg(count(lit(1)).as("cnt"))
    val g = PrefixSum.cumsumLong(dist, Seq(grp, v), Seq("cnt"), Seq("gcum"))
    // exclusive group offsets in the SAME (ascending grp) order the
    // range shuffle used; #groups rows — bounded driver metadata
    val totals = dist.groupBy(col(grp)).agg(sum(col("cnt")).as("n"))
      .orderBy(col(grp)).collect()
    var run = 0L
    val offRows = totals.map { r =>
      val row = Row(r.get(0), r.getLong(1), run); run += r.getLong(1); row
    }.toSeq
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(dist.schema(grp),
        StructField("n", LongType, nullable = false),
        StructField("goff", LongType, nullable = false))))
    g.join(broadcast(offDf), Seq(grp))
      .withColumn("cum", col("gcum") - col("goff"))
      .withColumn("prev", col("cum") - col("cnt"))
      .drop("gcum", "goff")
  }
}
