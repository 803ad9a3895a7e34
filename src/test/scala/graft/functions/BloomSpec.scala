package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom filter guarantees: zero false negatives (by construction),
  * false-positive rate within the sized bound, merge = union, and the
  * bloom-prefiltered semi join reproduces the plain semi join.
  */
class BloomSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  test("no false negatives; fp rate within the sized bound") {
    val bits = new Array[Byte](Bloom.M_BITS / 8)
    val members = (1L to 50000L).map(i => i * 2654435761L)
    members.foreach(Bloom.set(bits, _))
    assert(members.forall(Bloom.contains(bits, _)), "false negative!")
    val probes = (1L to 100000L).map(i => -i * 40503L - 7L)
    val fp = probes.count(Bloom.contains(bits, _)).toDouble / probes.size
    // m=2^19 bits, k=5, n=50k -> theoretical fp ~ 0.9%; assert < 3%
    assert(fp < 0.03, s"fp rate $fp out of bound")
  }

  test("distributed build equals local build (merge is exact OR-union)") {
    val keys = (1L to 2000L).toDF("k").repartition(16)
    val distributed = keys.agg(Bloom.build(col("k"))).head().getAs[Array[Byte]](0)
    val local = new Array[Byte](Bloom.M_BITS / 8)
    // mirror: the aggregate hashes with xxhash64 — recompute via Spark
    val hashes = keys.select(xxhash64(col("k"))).collect().map(_.getLong(0))
    hashes.foreach(Bloom.set(local, _))
    assert(java.util.Arrays.equals(distributed, local))
  }

  test("bloom-prefiltered semi join reproduces the plain semi join") {
    val got = graft.SparkEntry.registry("q_bloom_semi_join").fn(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    val hot = graft.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 450000).select(col("o_orderkey"))
    val plain = graft.Tables.lineitem(spark, sf)
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).toSet
    assert(got === plain)
  }

  test("probe expression stays in whole-stage codegen") {
    graft.functions.GraftFunctions.register(spark)
    val bits = new Array[Byte](Bloom.M_BITS / 8)
    Bloom.set(bits, 42L)
    val df = graft.Tables.lineitem(spark, sf)
      .filter(call_function("graft_bloom_contains",
        xxhash64(col("l_orderkey")), lit(bits)))
    // codegen stages print with a "*(n)" prefix in the plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.trim.startsWith("*")),
      s"probe filter not inside a codegen stage:\n$p")
  }
}
