package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated TPC-H-ish test tables.
  *
  * All reads are plain parquet scans so Catalyst pushes filters and
  * prunes columns at the source (verify with
  * `df.explain("formatted")` → PushedFilters / ReadSchema).
  */
object Tables {
  /** r14 (long-tail fixed floor; guide §6 file listing): every
    * `spark.read.parquet` re-resolves the relation — a fresh
    * InMemoryFileIndex listing plus a driver-side footer read for the
    * schema — and the registry calls these loaders ~2-3 times per
    * query, ~2000 times per bench pass (PhaseProbe measured ~33 s of
    * the sub-second tail's 93 s inside the registry fn calls, with
    * Catalyst planning < 1 s). Memoizing the ANALYZED DataFrame per
    * (session, dir, table) makes every later call reuse the resolved
    * relation and its file index. This is metadata reuse within one
    * process — each query still computes from the parquet bytes; no
    * result or intermediate is cached (DataFrames are immutable plans,
    * not data).
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val k = s"${spark.sparkContext.applicationId}:$sfDir:$name"
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      val built = spark.read.parquet(s"$sfDir/$name.parquet")
      val prev = memo.putIfAbsent(k, built)
      if (prev == null) built else prev
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped as two different physical parquet types
    * across testdata generations: TIMESTAMP(NANOS) (which Spark's
    * reader rejects unless nanos are surfaced as a raw long) and
    * plain timestamp[us]. Branch on the type the reader actually
    * produces so the engine is robust to either layout:
    *   - LongType (nanos-as-long): derive `ts_us = ts_ns div 1000`.
    *   - Timestamp/TimestampNTZ (micros): `ts_us = unix_micros(ts)`
    *     (session TZ is UTC, so the NTZ cast is exact).
    * Both paths emit the same logical columns: `ts_us` (bigint
    * micros, = DuckDB `epoch_us(ts)`) and a micros `ts` timestamp
    * for time arithmetic. Queries that OUTPUT event time must emit
    * `ts_us` (bigint) so results hash-match the oracle at micro
    * precision regardless of oracle-engine precision handling.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ =>
        raw
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts", timestamp_micros(col("ts_us")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
