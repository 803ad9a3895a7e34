package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Selection-aggregate laws for the bounded bottom-k device, and
  * window-equality pins for the operators converted off the
  * low-cardinality partitionBy window (the r13 sf100 ceiling class:
  * a #groups-task per-group sort caps any cluster at #groups cores,
  * however many executors exist). The top-k twin (TopK.Agg) is
  * pinned window-equal by AnnSpec's kNN case.
  */
class TopKSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  test("minKByKey == sorted take(k), across partitions, merges, ties") {
    val rows = (1L to 5000L).map { i =>
      (s"g${i % 7}", f"k${(i * 37) % 101}%03d", i % 997) // heavy key ties
    }
    val df = rows.toDF("g", "key", "id").repartition(13)
    val got = df.groupBy("g")
      .agg(TopK.minKByKey(5, col("key"), col("id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).sorted.take(5).map(_._2).toList).toMap
    assert(got === want.toMap)
  }

  test("converted top-k rows: no WindowExec, equal to window recomputes") {
    for (q <- Seq("ch_limit_by", "q_window_topn", "ch_grouparray_sample")) {
      val plan = graft.SparkEntry.registry(q).fn(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$q must selection-aggregate, not window:\n$plan")
    }

    // ch_limit_by: the original 25-key window formulation
    val wLb = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wantLb = graft.Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(wLb))
      .filter(col("rn") <= 3)
      .orderBy("c_nationkey", "rn").collect().toSeq
    val gotLb = graft.SparkEntry.registry("ch_limit_by")
      .fn(spark, sf).collect().toSeq
    assert(gotLb === wantLb, "ch_limit_by diverges from window recompute")

    // q_window_topn: the original 5-key window formulation
    val c = graft.Tables.customer(spark, sf)
    val o = graft.Tables.orders(spark, sf)
    val wTn = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wantTn = o.join(c, col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(wTn))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
      .orderBy("c_mktsegment", "rn").collect().toSeq
    val gotTn = graft.SparkEntry.registry("q_window_topn")
      .fn(spark, sf).collect().toSeq
    assert(gotTn === wantTn, "q_window_topn diverges from window recompute")

    // ch_grouparray_sample: the original hash-order window sample
    val users = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("hk",
        md5(concat(col("event_type"), lit(":"), col("user_id"))))
    val wGs = Window.partitionBy("event_type").orderBy("hk", "user_id")
    val wantGs = users.withColumn("rn", row_number().over(wGs))
      .filter(col("rn") <= 5)
      .groupBy("event_type")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("rn"), col("user_id")))),
          x => x("user_id"))).as("sampled_users"))
      .orderBy("event_type").collect().toSeq
    val gotGs = graft.SparkEntry.registry("ch_grouparray_sample")
      .fn(spark, sf).collect().toSeq
    assert(gotGs === wantGs,
      "ch_grouparray_sample diverges from window recompute")
  }
}
