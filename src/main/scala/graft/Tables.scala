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
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects (its timestamps are micros). Read nanos as a raw long
    * (`ts_ns`) and derive `ts_us` (micros, = DuckDB `epoch_us(ts)`)
    * plus a micros `ts` timestamp for time arithmetic. Queries that
    * OUTPUT event time must emit `ts_us` (bigint) so results
    * hash-match the oracle at micro precision regardless of whether
    * the oracle engine keeps or truncates the nanos; `ts` is safe
    * for comparisons against ms/us-aligned bounds (truncation
    * cannot flip those comparisons).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
