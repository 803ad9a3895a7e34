package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Regression spec for the two physical layouts `events.ts` has
  * shipped as across testdata generations: TIMESTAMP(NANOS) (which
  * Spark's reader surfaces as a raw nanos long under
  * `spark.sql.legacy.parquet.nanosAsLong`) and plain timestamp[us].
  * The round-4 testdata drift silently broke 42 operators for a full
  * round; this spec writes BOTH layouts to temp parquet and asserts
  * `Tables.events` normalizes them to identical `ts_us`/`ts` columns,
  * so the next drift is a red unit test instead of a broken round.
  */
class EventsLoaderSpec extends SparkSpec {

  test("events loader yields identical ts_us/ts for nanos-as-long and timestamp[us] layouts") {
    val s = spark
    import s.implicits._
    val tsUs = Seq(
      1704067200000000L,      // 2024-01-01 00:00:00 UTC
      1704067200000001L,      // +1 micro: sub-milli precision survives
      1735689599999999L)      // end-of-range, odd micros
    val base = tsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "us")

    val root = java.nio.file.Files
      .createTempDirectory("graft-events-layout").toString
    // layout A: micros timestamp (what current testdata ships)
    base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$root/us/events.parquet")
    // layout B: nanos as a raw int64 column — byte-identical to what
    // the nanosAsLong reader produces for a TIMESTAMP(NANOS) file
    // (Spark cannot WRITE nanos parquet, so the branch is exercised
    // via the type it dispatches on: a LongType ts column)
    base.select(col("event_id"), (col("us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$root/ns/events.parquet")

    val a = Tables.events(s, s"$root/us")
      .select(col("event_id"), col("ts_us"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      .sortBy(_._1)
    val b = Tables.events(s, s"$root/ns")
      .select(col("event_id"), col("ts_us"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      .sortBy(_._1)

    assert(a.toSeq == b.toSeq,
      s"layouts disagree:\n  us: ${a.mkString(", ")}\n  ns: ${b.mkString(", ")}")
    assert(a.map(_._2).toSeq == tsUs,
      "ts_us must be the exact micros the rows were built from")
    // both loaders must expose the same logical schema for downstream
    // operators (ts a micros timestamp, ts_us a bigint)
    val schemaA = Tables.events(s, s"$root/us").select("event_id", "ts", "ts_us").schema
    val schemaB = Tables.events(s, s"$root/ns").select("event_id", "ts", "ts_us").schema
    assert(schemaA == schemaB)
  }
}
