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

  /** Order-independent exact sum, surfaced as double. */
  def dsum(c: Column): Column = sum(d(c)).cast("double")

  /** Exact sum of a decimal product expression, surfaced as double
    * via a scale-6 rounding both engines convert exactly. */
  def psum(c: Column): Column = sum(c).cast(DOut).cast("double")

  /** Deterministic avg: exact decimal sum / count (IEEE division of
    * identical operands is identical in both engines). */
  def davg(c: Column): Column = sum(d(c)).cast("double") / count(lit(1))

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
