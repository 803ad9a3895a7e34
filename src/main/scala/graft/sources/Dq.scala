package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules (the audit half of
  * write-audit-publish, and a standalone expectation checker).
  *
  * All row-scan rules over one table compile into a SINGLE aggregate
  * pass — one conditional count per rule inside one scan, so auditing
  * 20 rules on 100 TB costs the same one read as auditing one rule.
  * Referential rules are each one anti-join count (broadcast when the
  * parent is a dimension). Output is (rule, violations) rows — empty
  * violations everywhere = the batch is publishable.
  */
object Dq {

  /** A rule whose violations are countable inside one scan of the
    * table: `violations` is an aggregate expression over the table's
    * columns (e.g. `count_if(c.isNull)`).
    */
  final case class ScanRule(name: String, violations: Column)

  /** violations = rows where `pred` holds. */
  def rowRule(name: String, pred: Column): ScanRule =
    ScanRule(name, count_if(pred))

  /** violations = rows in excess of the distinct count of `key`
    * (0 iff `key` is unique).
    */
  def uniqueRule(name: String, key: Column): ScanRule =
    ScanRule(name, count(lit(1)) - countDistinct(key))

  /** Evaluate every scan rule in ONE aggregate over df, then unpivot
    * to (rule, violations) rows.
    */
  def scanChecks(df: DataFrame, rules: Seq[ScanRule]): DataFrame = {
    val agged = df.agg(rules.head.violations.as(rules.head.name),
      rules.tail.map(r => r.violations.as(r.name)): _*)
    val stack = rules.map(r => s"'${r.name}', ${r.name}").mkString(", ")
    agged.select(expr(
      s"stack(${rules.size}, $stack) AS (rule, violations)"))
  }

  /** Referential-integrity rule: child rows whose `childKey` has no
    * match in `parent` — one anti join, broadcast-sized when the
    * parent is a dimension.
    */
  def refCheck(name: String, child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame =
    child.join(broadcast(parent), childKey === parentKey, "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** True iff no rule reports a violation (the WAP publish gate).
    * The collect is one row per rule — driver-side by design: the
    * audit DECISION is control flow, the counting was distributed.
    */
  def passes(checks: DataFrame): Boolean =
    checks.agg(max(col("violations"))).head.getLong(0) == 0L
}
