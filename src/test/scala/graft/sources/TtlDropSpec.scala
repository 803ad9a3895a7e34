package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TtlDropSpec extends SparkSpec {

  private def layout(tag: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_ttldrop_$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    Sink.writePartitionedSorted(Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_us", "value"), out,
      "ev_day" -> from_unixtime(expr("ts_us div 1000000"), "yyyy-MM-dd"),
      Seq("user_id"))
    out
  }

  test("expired day partitions drop by directory delete; survivors untouched") {
    val out = layout("main")
    val cutoff = "2024-01-15"
    def partDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ev_day=")).toSeq
    val before = partDirs
    assert(before.exists(_.getName < s"ev_day=$cutoff"), "no expired partitions staged")
    // survivor file fingerprints before the drop
    def survivorFiles = before.filter(_.getName >= s"ev_day=$cutoff")
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    val fingerprints = survivorFiles

    val dropped = Sink.dropExpiredPartitions(spark, out, "ev_day", _ < cutoff)
    assert(dropped.nonEmpty && dropped.forall(_ < cutoff))

    val after = partDirs
    assert(after.forall(_.getName >= s"ev_day=$cutoff"),
      "an expired partition survived the drop")
    // Survivors byte-identical: same files, same length, same mtime —
    // proof the drop never opened or rewrote a surviving data file.
    assert(survivorFiles == fingerprints)

    // Read-back equals the row-level TTL filter on the source.
    val got = spark.read.parquet(out).count()
    val want = Tables.events(spark, sf)
      .filter(from_unixtime(expr("ts_us div 1000000"), "yyyy-MM-dd") >= cutoff)
      .count()
    assert(got == want, s"read-back $got rows, want $want")
  }

  test("compaction rewrites a fragmented layout to one sorted file per partition") {
    val frag = s"${System.getProperty("java.io.tmpdir")}/graft_compact_in"
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_compact_out"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(frag))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    // Fragment: four append batches, several files per day partition.
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        from_unixtime(expr("ts_us div 1000000"), "yyyy-MM-dd").as("ev_day"))
    for (i <- 0 until 4)
      e.filter(pmod(col("event_id"), lit(4)) === i)
        .write.mode("append").partitionBy("ev_day").parquet(frag)
    def filesPerPartition(root: String): Map[String, Int] =
      new java.io.File(root).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ev_day="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(filesPerPartition(frag).values.exists(_ > 1),
      "staging did not fragment the layout")

    Sink.compactPartitioned(spark, frag, out, "ev_day", Seq("user_id", "ts_us"))
    val after = filesPerPartition(out)
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction left multi-file partitions: $after")
    assert(spark.read.parquet(out).count() == spark.read.parquet(frag).count(),
      "compaction lost or duplicated rows")
  }

  test("queries on the post-drop layout still partition-prune") {
    val out = layout("prune")
    Sink.dropExpiredPartitions(spark, out, "ev_day", _ < "2024-01-15")
    val q = spark.read.parquet(out).filter(col("ev_day") === lit("2024-01-20"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("ev_day"),
      s"no partition filter in scan:\n$scan")
  }
}
