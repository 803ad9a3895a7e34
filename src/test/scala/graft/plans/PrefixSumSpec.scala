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
}
