package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit semantics of the MergeTree-engine emulations on data small
  * enough to reason about by hand.
  */
class MergeTreeSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("replacingMergeTree keeps the max-version row per key") {
    val df = Seq(
      ("a", 1L, "v1"), ("a", 3L, "v3"), ("a", 2L, "v2"),
      ("b", 7L, "w7")).toDF("k", "ver", "payload")
    val out = ClickHouse.replacingMergeTree(df, Seq("k"), col("ver"), col("payload"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("a", 3L, "v3"), ("b", 7L, "w7")))
  }

  test("replacingMergeTree breaks version ties deterministically") {
    val df = Seq(("a", 1L, "x"), ("a", 1L, "z"), ("a", 1L, "y"))
      .toDF("k", "ver", "payload")
    val out = ClickHouse.replacingMergeTree(df, Seq("k"), col("ver"), col("payload"))
      .collect()
    assert(out.length == 1 && out(0).getString(2) == "z")
  }

  test("summingMergeTree adds measures per key") {
    val df = Seq(("a", 1.0), ("a", 2.5), ("b", 4.0)).toDF("k", "m")
    val out = ClickHouse.summingMergeTree(df, Seq("k"),
      Map("total" -> sum(col("m")))).orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("n_rows"),
      r.getAs[Double]("total"))).toSeq == Seq(("a", 2L, 3.5), ("b", 1L, 4.0)))
  }

  test("collapsingMergeTree cancels +1/-1 pairs and keeps net rows") {
    val df = Seq(
      ("a", 1, 10.0), ("a", -1, 10.0),          // cancels exactly
      ("b", 1, 5.0), ("b", 1, 3.0), ("b", -1, 5.0) // net +3
    ).toDF("k", "sign", "m")
    val out = ClickHouse.collapsingMergeTree(df, Seq("k"), col("sign"), col("m"))
      .orderBy("k").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "b")
    assert(out(0).getAs[Long]("net_sign") == 1L)
    assert(out(0).getAs[Double]("net_measure") == 3.0)
  }
}
