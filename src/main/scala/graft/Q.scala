package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One registered operator: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables. `bench = false` marks entries
  * excluded from the headline benchmark set (e.g. O(n^2) correctness
  * baselines that have a dedicated scale-path variant). `benchFn`,
  * when set, is the shape the BENCHMARK runs instead of `fn` — for
  * operators whose verify shape carries extra oracle-ability
  * machinery (e.g. an in-query exact-NDV certificate) that is not
  * part of the operator's production cost.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true,
    benchFn: Option[(SparkSession, String) => DataFrame] = None)

/** Exact fixed-point aggregation helpers.
  *
  * All money/quantity columns in the test data are exact 2-decimal
  * values. Casting them to DECIMAL(12,4) before aggregating makes
  * sums exact and order-independent, so Spark and the DuckDB oracle
  * produce bit-identical doubles — no float-summation-order drift.
  * DECIMAL(12,4) is chosen so that a triple product still fits in 38
  * digits of precision in BOTH engines (Spark: 12+12+1+12+1=38;
  * DuckDB: 12+12+12=36).
  */
object Dec {
  val D: DecimalType = DecimalType(12, 4)

  /** Final-sum type before surfacing as double. Scale 6 covers the
    * true precision of any 2dp x 2dp x 2dp product, and keeps
    * unscaled sums under 2^53 so BOTH engines' decimal->double casts
    * are exact — a decimal(38,12) sum cast straight to double is
    * correctly rounded by Spark (BigDecimal) but off by 1 ulp in
    * DuckDB (naive int128/10^12 divide).
    */
  val DOut: DecimalType = DecimalType(38, 6)

  /** Exact fixed-point view of a 2-decimal column. */
  def d(c: Column): Column = c.cast(D)

  /** Exact integer cents (scale-2 units) of a 2-decimal-exact double
    * column, recovered by pure double arithmetic: c is an exact 2dp
    * value, so c*100 lands within ~1e-4 of its integer and one
    * floor(+0.5) snaps it exactly (both signs). Codegen-friendly long
    * math — no per-row BigDecimal, unlike a decimal cast.
    */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5d)).cast("long")

  /** Exact scale-4 integer units of a <=4-decimal-exact double column
    * — the long twin of the old `cast(c as DECIMAL(12,4))` input
    * rounding, for dsum inputs that are DERIVED (e.g. a repriced
    * `price * 1.05` carries 4 decimals, which scale-2 cents would
    * round and the oracle would not). Same recovery argument as
    * [[cents]]: the true value is N/1e4, so c*1e4 lands within
    * ~N*2e-16 << 0.5 of N and one floor(+0.5) snaps it exactly.
    */
  def u4(c: Column): Column = floor(c * 10000 + lit(0.5d)).cast("long")

  /** Order-independent exact sum, surfaced as double.
    *
    * r13 optimization (guide §1.2 "per-task work" + the repo's own
    * "keep the statistic integer until one closing division" device):
    * the former sum(DECIMAL(12,4)) carries a (22,4) buffer whose
    * precision exceeds Spark's compact-long decimal range, so every
    * row paid a JavaBigDecimal add (~4x a long sum, measured 0.74 s
    * vs 0.19 s on one sf0.1 aggregation). Summing exact integer
    * units in LONGs and dividing once at the end yields the
    * bit-identical double: the integer sum is exact, the closing
    * decimal division is exact (scale 6 >= 2), and the final cast is
    * the same correctly-rounded decimal->double both engines perform.
    * Inputs are scale-4 units ([[u4]]) because dsum is also applied
    * to derived 3-4dp values (repriced columns), mirroring the old
    * decimal(12,4) input rounding exactly.
    *
    * r14 scale hardening (verdict #1): a single long sum of u4 units
    * wraps at 9.2e18 units ~= $9.2e14 per group — INSIDE the ~100 TB
    * target (TPC-H sf1e5 q01 groups sum ~8e19 units), and a non-ANSI
    * sum(long) wraps silently. The [[psumLong]] hi/lo split applies
    * unchanged: per row hi = u div 1e6 (exact-double divide +
    * truncate; the identity holds even if hi were off one), lo =
    * u - hi*1e6, and sum(u) = sum(hi)*1e6 + sum(lo) EXACTLY with both
    * running sums in-range out to ~1e12 rows per group (u4 row values
    * are < 2^53 by the u4 recovery precondition, so hi < 9e9 and
    * |lo| < 2e6). Recombined in decimal, divided once, same closing
    * cast. Same cost class: two long sums instead of one.
    * DsumOverflowSpec drives a group past 2^63 units and asserts the
    * exact sum.
    */
  def dsum(c: Column): Column = {
    val m = 1000000L
    val u = u4(c)
    val hi = (u.cast("double") / m).cast("long")
    val lo = u - hi * m
    ((sum(hi).cast(DecimalType(38, 0)) * m + sum(lo).cast(DecimalType(38, 0)))
      / 10000).cast("double")
  }

  /** Exact sum of a decimal product expression, surfaced as double
    * via a scale-6 rounding both engines convert exactly. */
  def psum(c: Column): Column = sum(c).cast(DOut).cast("double")

  /** Integer-cents views of the (1 ± x) revenue factors (x an exact
    * 2dp value): scale-2 longs, e.g. oneMinus(0.04) -> 96. */
  def centsOneMinus(c: Column): Column = lit(100L) - cents(c)
  def centsOnePlus(c: Column): Column = lit(100L) + cents(c)

  /** [[psum]]'s long twin (r13): exact sum of a LONG product of
    * integer-cents factors whose total decimal scale is `scale`
    * (2 per cents factor), surfaced as double bit-identically to
    * psum of the decimal product it replaces.
    *
    * Why: psum's decimal(25,8)+ sums run on JavaBigDecimal per row
    * (~4x a long sum, measured). The product of cents factors is an
    * exact integer in a long (max ~1.1e11 for the charge triple —
    * far under 2^53), so the whole sum can be integer — but a single
    * long SUM of such products would overflow near 8e7 rows/group.
    * Decomposing each row product as hi = prod div 1e6 (via an exact
    * double divide + truncate; the identity below holds even if hi
    * were off), lo = prod - hi*1e6 keeps BOTH running sums in-range
    * out to ~1e12 rows per group (~100 TB+), and
    * sum(prod) = sum(hi)*1e6 + sum(lo) EXACTLY — recombined in
    * decimal at the end, divided once, and cast through the same
    * (38,6) closing both engines convert exactly (Spark's decimal
    * type adjustment makes the division land on DecimalType(38,6),
    * exact for true scale <= 6, i.e. up to three 2dp factors).
    */
  def psumLong(scale: Int, prod: Column): Column = {
    require(scale <= 6, "psumLong: closing division is exact to scale 6")
    val m = 1000000L
    val hi = (prod.cast("double") / m).cast("long")
    val lo = prod - hi * m
    ((sum(hi).cast(DecimalType(38, 0)) * m + sum(lo).cast(DecimalType(38, 0)))
      / math.pow(10, scale).toLong).cast("double")
  }

  /** [[psumLong]] with the closing value ROUNDED to integer (scale-0
    * HALF_UP) before the double cast — the long twin of the isum
    * device `sum(decimal).cast(DECIMAL(38,0)).cast(double)` used by
    * the moment/weighted-average operators.
    */
  def isumLong(scale: Int, prod: Column): Column = {
    require(scale <= 6, "isumLong: closing division is exact to scale 6")
    val m = 1000000L
    val hi = (prod.cast("double") / m).cast("long")
    val lo = prod - hi * m
    ((sum(hi).cast(DecimalType(38, 0)) * m + sum(lo).cast(DecimalType(38, 0)))
      / math.pow(10, scale).toLong)
      .cast(DecimalType(38, 0)).cast("double")
  }

  /** Exact long view of an INTEGER-valued double column (quantity). */
  def asLong(c: Column): Column = floor(c + lit(0.5d)).cast("long")

  /** Revenue row product a*(1-b) as an exact scale-4 long. */
  def revL(a: Column, b: Column): Column = cents(a) * centsOneMinus(b)

  /** sum(a * (1-b)) — the revenue pattern, long-cents path. */
  def psumRev(a: Column, b: Column): Column = psumLong(4, revL(a, b))

  /** Deterministic avg: exact decimal sum / count (IEEE division of
    * identical operands is identical in both engines). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  def oneMinus(c: Column): Column = (lit(1) - d(c)).cast(D)
  def onePlus(c: Column): Column = (lit(1) + d(c)).cast(D)
}

/** DuckDB-side SQL fragments mirroring [[Dec]]. */
object Sql {
  def d(c: String): String = s"CAST($c AS DECIMAL(12,4))"
  def dsum(c: String): String = s"CAST(sum(${d(c)}) AS DOUBLE)"
  def davg(c: String): String = s"(CAST(sum(${d(c)}) AS DOUBLE) / count(*))"
  def oneMinus(c: String): String = s"CAST(1 - ${d(c)} AS DECIMAL(12,4))"
  def onePlus(c: String): String = s"CAST(1 + ${d(c)} AS DECIMAL(12,4))"
  /** Mirrors [[Dec.psum]]: exact product sum surfaced as double. */
  def psum(e: String): String =
    s"CAST(CAST(sum($e) AS DECIMAL(38,6)) AS DOUBLE)"
  /** sum(a * (1-b)) — the revenue pattern. */
  def revenue(a: String, b: String): String =
    psum(s"${d(a)} * ${oneMinus(b)}")
}
