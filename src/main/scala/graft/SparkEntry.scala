package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full registry: every operator from SURVEY.md §2 that is DONE. */
  def registry: Map[String, Q] =
    Relational.all ++ Tpch.all ++ ClickHouse.all ++ Functions.all ++
      Sources.all ++ TextAnalysis.all ++ Dedup.all ++ Ann.all ++
      Multimodal.all ++ Streaming.all ++ Analytics.all ++ Extra.all ++
      Stats.all ++ Incremental.all ++ Graph.all ++ Advanced.all ++
      Interop.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.view.mapValues(_.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, q) if q.oracle.isDefined =>
      k -> q.oracle.get.trim }

  /** Headline subset for Bench (excludes correctness-only baselines;
    * runs an operator's benchFn shape when one is registered). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    registry.collect { case (k, q) if q.bench => k -> q.benchFn.getOrElse(q.fn) }
}
