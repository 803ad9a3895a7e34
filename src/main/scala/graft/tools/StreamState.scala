package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming STATE-STORE scale evidence (r12 verdict prescription #7):
  * the 100-TB streaming question is state growth per watermark
  * advance, not throughput. Runs the two stateful flagship shapes —
  * stream_cdc_upsert (flatMapGroupsWithState, one row per live key)
  * and stream_tdigest's windowed aggregate (one sketch row per open
  * (window, type) group) — over a time-ordered staged event stream
  * under the RocksDB state store provider, and records, per
  * micro-batch, the state operator's numRowsTotal / memoryUsedBytes
  * and the watermark, plus the per-rung BOUND checks:
  *
  *  - CDC upsert: final state rows == live keys (state is O(keys),
  *    never O(events) — n_versions folds in place);
  *  - windowed agg (append mode): final state rows < total windows
  *    (the watermark EVICTS closed windows as event time advances;
  *    a complete-mode dashboard would instead hold all windows).
  *
  * Usage: runMain graft.tools.StreamState <out.json>
  *          [name=dir ...]        (default: sf0.1=/root/testdata/sf0.1)
  */
object StreamState {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts_us", LongType),
    StructField("value", DoubleType)))

  private def stage(spark: SparkSession, dir: String, tag: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_ss_$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val e = graft.Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "ts_us", "value")
    // 8 time-ordered slices: each micro-batch advances event time, so
    // the watermark advances per batch and closed windows evict — the
    // arrival shape a real ingest has
    val qs = e.stat.approxQuantile("ts_us",
      (1 to 7).map(_ / 8.0).toArray, 0.001)
    val bounds = (Long.MinValue +: qs.map(_.toLong)) :+ Long.MaxValue
    for (i <- 0 until 8) {
      e.filter(col("ts_us") > bounds(i) && col("ts_us") <= bounds(i + 1))
        .coalesce(1).write.mode("append").parquet(out)
      Thread.sleep(1100) // distinct mod-times => stable pickup order
    }
    out
  }

  private final case class BatchState(batch: Long, inputRows: Long,
      stateRows: Long, stateBytes: Long, watermark: String)

  /** Run `build(stream)` to completion over the staged files (one per
    * trigger) and return per-batch state metrics from the progress
    * stream.
    */
  private def run(spark: SparkSession, staged: String, mode: String,
      build: DataFrame => DataFrame): Seq[BatchState] = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = build(src).writeStream.format("noop").outputMode(mode).start()
    q.processAllAvailable()
    val prog = q.recentProgress.toSeq
    q.stop()
    prog.filter(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
      .map { p =>
        val so = p.stateOperators(0)
        BatchState(p.batchId, p.numInputRows, so.numRowsTotal,
          so.memoryUsedBytes,
          Option(p.eventTime.get("watermark")).getOrElse("-"))
      }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("STREAM_STATE.json")
    val rungs =
      if (args.length >= 2)
        args.drop(1).toSeq.map { a =>
          val Array(n, d) = a.split("=", 2); (n, d)
        }
      else Seq("sf0.1" -> "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the 100-TB state backend: RocksDB keeps state off-heap/on-disk
      // per executor instead of in the JVM heap (HDFSBackedStateStore
      // holds every version's map in memory — the small-state default)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def fmt(b: Seq[BatchState]): String = b.map(s =>
      s"""{"batch":${s.batch},"input_rows":${s.inputRows},""" +
        s""""state_rows":${s.stateRows},"state_bytes":${s.stateBytes},""" +
        s""""watermark":"${s.watermark}"}""").mkString("[", ",", "]")

    val rungJsons = rungs.map { case (name, dir) =>
      val staged = stage(spark, dir, name.replaceAll("[^A-Za-z0-9]", "_"))
      val ev = graft.Tables.events(spark, dir)
      val liveKeys = ev.select("user_id").distinct().count()
      val totalWindows = ev
        .select(window(col("ts"), "1 hour"), col("event_type"))
        .distinct().count()
      val nEvents = ev.count()

      // 1) CDC upsert: state rows must equal live keys at completion
      val cdc = run(spark, staged, "update", df =>
        graft.streaming.Upsert.stream(
          df.select("user_id", "event_id", "ts_us", "event_type",
            "value", "ts").as[graft.streaming.Upsert.Ev]).toDF())
      val cdcFinal = cdc.lastOption.map(_.stateRows).getOrElse(-1L)
      require(cdcFinal == liveKeys,
        s"$name: cdc state rows $cdcFinal != live keys $liveKeys")

      // 2) windowed t-digest agg, append mode: the watermark evicts
      // closed windows, so final state stays well under total windows
      val agg = run(spark, staged, "append", df =>
        df.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(graft.functions.TDigestSketch(200, Seq(0.5, 0.9),
            col("value")).as("est")))
      val aggFinal = agg.lastOption.map(_.stateRows).getOrElse(-1L)
      val aggPeak = agg.map(_.stateRows).maxOption.getOrElse(-1L)
      require(aggFinal < totalWindows,
        s"$name: watermark evicted nothing ($aggFinal of $totalWindows)")

      System.err.println(s"[stream-state] $name events=$nEvents " +
        s"keys=$liveKeys cdc_final=$cdcFinal windows=$totalWindows " +
        s"agg_peak=$aggPeak agg_final=$aggFinal")
      s""""$name":{"events":$nEvents,"live_keys":$liveKeys,""" +
        s""""total_windows":$totalWindows,""" +
        s""""cdc_batches":${fmt(cdc)},"cdc_final_state_rows":$cdcFinal,""" +
        s""""agg_batches":${fmt(agg)},"agg_peak_state_rows":$aggPeak,""" +
        s""""agg_final_state_rows":$aggFinal}"""
    }
    val doc = s"""{"metric":"streaming_state_store_scale",""" +
      s""""provider":"RocksDBStateStoreProvider",""" +
      rungJsons.mkString("", ",", "") +
      s""","note":"state rows per micro-batch under a time-ordered 8-batch arrival: CDC upsert state == live keys (O(keys), never O(events)); append-mode windowed sketch state is evicted by the watermark as event time advances - the two bounds that hold at any corpus scale"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc + "\n")
    println(doc)
    spark.stop()
  }
}
