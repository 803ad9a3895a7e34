package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** dq_profile family experiments (r13). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = mk
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      println(f"[s2] $name%-30s " +
        ts.map { case (b, e) => f"$b%.2f+$e%.2f" }.mkString("  "))
    }

    val cols = Seq(
      "o_orderkey" -> col("o_orderkey"),
      "o_custkey" -> col("o_custkey"),
      "o_orderstatus" -> col("o_orderstatus"),
      "o_totalprice" -> col("o_totalprice").cast(DecimalType(12, 2)),
      "o_orderdate" -> col("o_orderdate").cast("date"))
    def orders = graft.Tables.orders(spark, sfDir)

    // current exact shape
    def exactCur = {
      val aggs = cols.flatMap { case (n, c) => Seq(
        min(c).cast("string").as(s"${n}_min"),
        max(c).cast("string").as(s"${n}_max"),
        countDistinct(c).as(s"${n}_ndv"),
        count_if(c.isNull).as(s"${n}_nulls")) }
      val stacked = cols.map { case (n, _) =>
        s"'$n', ${n}_min, ${n}_max, ${n}_ndv, ${n}_nulls" }.mkString(", ")
      orders.agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.size}, $stacked) " +
          "AS (column_name, min_v, max_v, ndv, nulls)"))
        .orderBy("column_name")
    }
    // restructured: string min/max in a separate 1-column agg
    def exactNew = {
      val aggs = cols.flatMap { case (n, c) =>
        (if (n == "o_orderstatus") Seq.empty else Seq(
          min(c).cast("string").as(s"${n}_min"),
          max(c).cast("string").as(s"${n}_max"))) ++ Seq(
        countDistinct(c).as(s"${n}_ndv"),
        count_if(c.isNull).as(s"${n}_nulls")) }
      val sAgg = orders.agg(
        min(col("o_orderstatus")).cast("string").as("o_orderstatus_min"),
        max(col("o_orderstatus")).cast("string").as("o_orderstatus_max"))
      val stacked = cols.map { case (n, _) =>
        s"'$n', ${n}_min, ${n}_max, ${n}_ndv, ${n}_nulls" }.mkString(", ")
      orders.agg(aggs.head, aggs.tail: _*)
        .crossJoin(broadcast(sAgg))
        .select(expr(s"stack(${cols.size}, $stacked) " +
          "AS (column_name, min_v, max_v, ndv, nulls)"))
        .orderBy("column_name")
    }
    // approx current
    def approxCur = {
      val aggs = cols.flatMap { case (n, c) => Seq(
        min(c).cast("string").as(s"${n}_min"),
        max(c).cast("string").as(s"${n}_max"),
        approx_count_distinct(c, 0.01).as(s"${n}_ndv"),
        count_if(c.isNull).as(s"${n}_nulls")) }
      val stacked = cols.map { case (n, _) =>
        s"'$n', ${n}_min, ${n}_max, ${n}_ndv, ${n}_nulls" }.mkString(", ")
      orders.agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.size}, $stacked) " +
          "AS (column_name, min_v, max_v, ndv, nulls)"))
        .orderBy("column_name")
    }
    time("exact current")(exactCur)
    time("exact split-string")(exactNew)
    time("approx current")(approxCur)
    // equality check
    val a = exactCur.collect().map(_.toString).toSeq
    val b = exactNew.collect().map(_.toString).toSeq
    println(s"[s2] exact shapes equal: ${a == b}")
    println("[s2] plans: exactNew:")
    println(exactNew.queryExecution.executedPlan.toString.take(1500))
    spark.stop()
  }
}
