package graft

import org.apache.spark.sql.functions._

/** r14 verdict #2: Dec.dsum must stay exact when a single group's
  * scale-4 unit sum exceeds Long.MaxValue (~9.2e18 units) — the
  * regime a ~100 TB TPC-H q01 group reaches (~8e19 units), where the
  * r13 single-long sum wrapped SILENTLY. The hi/lo split keeps both
  * running sums in-range out to ~1e12 rows per group.
  */
class DsumOverflowSpec extends SparkSpec {

  test("dsum is exact past the single-long overflow point (2^63 u4 units)") {
    // 2048 rows of 9.0e11 money units = 9.0e15 u4-units per row
    // (within u4's 2^53 per-row exactness bound); group sum =
    // 2048 * 9.0e15 = 1.8432e19 u4-units — 2x past Long.MaxValue,
    // where a single sum(long) wraps. True sum = 1.8432e15 money,
    // < 2^53, so the expected double is exact.
    val spark0 = spark
    import spark0.implicits._
    val df = spark0.range(2048).select(lit(9.0e11).as("v"))
    val got = df.agg(Dec.dsum($"v").as("s")).head.getDouble(0)
    assert(got == 1.8432e15, s"dsum wrapped or drifted: $got")
    // sign-mixed: the split must stay exact with negative rows too
    val mixed = spark0.range(2048).select(
      when(pmod($"id", lit(2)) === 0, lit(9.0e11))
        .otherwise(lit(-4.5e11)).as("v"))
    val gotMixed = mixed.agg(Dec.dsum($"v").as("s")).head.getDouble(0)
    assert(gotMixed == 1024 * 9.0e11 - 1024 * 4.5e11,
      s"sign-mixed dsum drifted: $gotMixed")
  }

  test("dsum matches the old decimal-sum semantics on ordinary money values") {
    val spark0 = spark
    import spark0.implicits._
    // 4dp-exact derived values (the repriced-column case that drove u4)
    val df = spark0.range(10000).select(
      (($"id" % 997).cast("double") * lit(1.0375)).as("v"))
    val got = df.agg(Dec.dsum($"v").as("s")).head.getDouble(0)
    val expect = df.agg(
      (sum($"v".cast(org.apache.spark.sql.types.DecimalType(12, 4)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
        .cast("double").as("s")).head.getDouble(0)
    assert(got == expect, s"dsum $got != decimal reference $expect")
  }
}
