package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {

  test("batch states merge to the exact one-pass state (bit equality)") {
    GraftFunctions.register(spark)
    val e = Tables.events(spark, sf)
      .select(col("event_type"), xxhash64(col("user_id")).as("h"),
        pmod(col("event_id"), lit(2)).as("batch"))
    val onePass = e.groupBy("event_type")
      .agg(Hll.state(col("h")).as("state"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val merged = e.groupBy("event_type", "batch")
      .agg(Hll.state(col("h")).as("state"))
      .groupBy("event_type")
      .agg(Hll.mergeStates(col("state")).as("state"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(onePass.keySet == merged.keySet)
    for ((k, s) <- onePass)
      assert(java.util.Arrays.equals(s, merged(k)),
        s"merged state differs from one-pass state for $k")
  }

  test("estimate is within 5% of the exact distinct count") {
    GraftFunctions.register(spark)
    val e = Tables.events(spark, sf)
    val est = e.select(xxhash64(col("user_id")).as("h"))
      .agg(Hll.state(col("h")).as("state"))
      .select(expr("graft_hll_estimate(state)")).head().getLong(0)
    val exact = e.select(countDistinct(col("user_id"))).head().getLong(0)
    val err = math.abs(est - exact).toDouble / exact
    info(f"hll estimate $est vs exact $exact (err ${err * 100}%.2f%%)")
    assert(err <= 0.05, f"HLL error ${err * 100}%.1f%% above 5%%")
  }

  test("reference implementation: add/merge/estimate behave on planted data") {
    // 1000 distinct hashes via splitmix-ish mixing of i
    def mix(i: Long): Long = {
      var z = i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val a = Hll.emptyState
    val b = Hll.emptyState
    (0 until 500).foreach(i => Hll.add(a, mix(i.toLong)))
    (250 until 1000).foreach(i => Hll.add(b, mix(i.toLong)))
    val est = Hll.estimate(Hll.merge(a, b))
    assert(math.abs(est - 1000) < 80, s"merged estimate $est far from 1000")
    // idempotence: merging a state with itself changes nothing
    val c = Hll.emptyState
    (0 until 100).foreach(i => Hll.add(c, mix(i.toLong)))
    val before = c.clone()
    assert(java.util.Arrays.equals(Hll.merge(c, before), before))
  }
}
