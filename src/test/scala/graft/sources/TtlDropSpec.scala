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

  test("hot partition value spreads across tasks at ingest; files stay sorted") {
    // The r11 sf10 ladder's ch_final_write cliff: the old value-keyed
    // repartition put EVERY row of a partition value in one task, so a
    // corpus spanning one month wrote 1-wide at any scale. The range
    // repartition must (a) still produce one dir per value, (b) write
    // a hot value through MULTIPLE tasks, (c) keep each output file
    // internally sorted by the sort key (row-group pruning contract).
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_hotpart"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    // AQE (rightly) coalesces the tiny test corpus back to one sized
    // partition — at sf10 it sizes the same write to ~advisory-sized
    // parallel files. Disable it here so the RANGE mechanics (not the
    // AQE sizing policy) are what this spec exercises at 1000 rows.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Sink.writePartitionedSorted(Tables.events(spark, sf)
        .select("event_id", "user_id", "ts_us"), out,
        "ev_month" -> from_unixtime(expr("ts_us div 1000000"), "yyyy-MM"),
        Seq("user_id"))
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ev_month=")).toSeq
    assert(dirs.size == 1, s"events span one month, got ${dirs.map(_.getName)}")
    val files = dirs.head.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1,
      s"hot partition value wrote ${files.length} file(s) — the 1-wide cliff")
    // per-file sortedness by user_id (parquet preserves row order)
    for (f <- files.take(3)) {
      val ids = spark.read.parquet(f.getPath)
        .select("user_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"${f.getName} not user_id-sorted")
    }
    // and the layout reassembles exactly
    assert(spark.read.parquet(out).count() === Tables.events(spark, sf).count())
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
