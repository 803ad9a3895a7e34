package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The genuinely-streaming executions: each one runs a real
  * readStream -> transform -> memory-sink query over the events
  * table (staged as files) and must reproduce the batch-path rows.
  */
class StreamingSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private lazy val stageDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stream_stage"
    // Stage events as multiple files in TIME order (quartile buckets,
    // appended oldest-first with distinct mod-times): a real stream
    // delivers roughly in event-time order, and the file source picks
    // up files oldest-first. Hash-partitioned staging would make the
    // first micro-batch span the whole time range and push the
    // watermark past everything else.
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val e = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_us", "value")
    val qs = e.stat.approxQuantile("ts_us", Array(0.25, 0.5, 0.75), 0.0)
    val bounds = (Long.MinValue +: qs.map(_.toLong)) :+ Long.MaxValue
    for (i <- 0 until 4) {
      e.filter(col("ts_us") > bounds(i) && col("ts_us") <= bounds(i + 1))
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // distinct file mod-times => stable pickup order
    }
    dir
  }

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts_us", LongType),
    StructField("value", DoubleType)))

  private def streamedEvents: DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
      .withColumn("ts", timestamp_micros(col("ts_us")))

  private def runToCompletion(df: DataFrame, name: String,
      mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().map(_.toSeq.toIndexedSeq)
      .sortBy(_.mkString("|")).toIndexedSeq
  }

  test("streaming windowed agg equals the batch window query") {
    val streamed = runToCompletion(
      streamedEvents
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          graft.Dec.dsum(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value")),
      "stream_window_agg_t", "complete")
    val batch = SparkEntry.registry("stream_window_agg").fn(spark, sf)
    assert(canon(streamed) == canon(batch))
  }

  test("streaming sliding (hopping) window equals the batch twin") {
    val streamed = runToCompletion(
      streamedEvents
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          graft.Dec.dsum(col("value")).as("total_value"))
        .select(unix_micros(col("window.start")).as("ws_us"),
          col("event_type"), col("n_events"), col("total_value")),
      "stream_sliding_t", "complete")
    val batch = SparkEntry.registry("stream_sliding_window").fn(spark, sf)
    assert(canon(streamed) == canon(batch))
  }

  test("streaming native session_window equals the batch twin") {
    val streamed = runToCompletion(
      streamedEvents
        .withWatermark("ts", "2 hours")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          graft.Dec.dsum(col("value")).as("total_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"), col("total_value")),
      "stream_session_native_t", "complete")
    val batch = SparkEntry.registry("stream_session_native").fn(spark, sf)
    assert(canon(streamed) == canon(batch))
  }

  test("streaming dropDuplicates within watermark equals batch dedup") {
    val s = streamedEvents
    val streamed = runToCompletion(
      s.union(s)
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), graft.Dec.dsum(col("value")).as("total")),
      "stream_dedup_t", "complete")
    val batch = SparkEntry.registry("stream_dedup").fn(spark, sf)
    assert(canon(streamed) == canon(batch))
  }

  test("Trigger.AvailableNow drains the backlog then self-terminates") {
    // the operational catch-up mode: process everything currently on
    // disk as a bounded streaming run (checkpoint-compatible with the
    // continuous deployment), then stop
    val q = streamedEvents
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("avail_now_t")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow query must self-terminate")
    val got = spark.table("avail_now_t").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("checkpoint restart recovers aggregation state: no loss, no reprocess") {
    // The deployment property AvailableNow only implies: a STOPPED
    // stateful query restarted from its checkpoint must (a) remember
    // aggregate state from before the stop and (b) skip files it
    // already consumed. Run 1 drains half the events and stops; more
    // files arrive; run 2 restarts from the same checkpoint and must
    // produce the FULL counts while its source reads only the new
    // file.
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_restart"
    val dataDir = s"$base/data"; val ckpt = s"$base/ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val e = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_us", "value")
    val half1 = e.filter(pmod(col("event_id"), lit(2)) === 0)
    val half2 = e.filter(pmod(col("event_id"), lit(2)) === 1)
    half1.coalesce(1).write.mode("append").parquet(dataDir)

    @volatile var last: Map[String, Long] = Map.empty
    def runDrain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(dataDir)
        .groupBy("event_type").count()
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.collect()
          if (rows.nonEmpty)
            last = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000): Unit
    }
    def counts(df: DataFrame): Map[String, Long] =
      df.groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    runDrain()
    assert(last == counts(half1), "run 1 must see exactly the staged half")

    half2.coalesce(1).write.mode("append").parquet(dataDir)
    runDrain() // NEW query, SAME checkpoint
    assert(last == counts(e),
      "restart must recover run-1 state and add only the new file")
  }

  test("foreachBatch -> write-audit-publish quarantines corrupt micro-batches") {
    import graft.sources.{Dq, TimeTravel}
    // two staged files = two micro-batches (maxFilesPerTrigger=1):
    // batch of evens is clean, batch of odds carries planted NULL
    // event types — the dq audit must publish the first and abort the
    // second, leaving the table at exactly one clean version
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_swap"
    val dataDir = s"$base/in"; val root = s"$base/table"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val e = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_us", "value")
    e.filter(pmod(col("event_id"), lit(2)) === 0)
      .coalesce(1).write.mode("append").parquet(dataDir)
    Thread.sleep(1100)
    e.filter(pmod(col("event_id"), lit(2)) === 1)
      .withColumn("event_type",
        when(pmod(col("event_id"), lit(7)) === 1, lit(null: String))
          .otherwise(col("event_type")))
      .coalesce(1).write.mode("append").parquet(dataDir)

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dataDir)
      .writeStream
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        val tag = f"e$epoch%06d"
        TimeTravel.stage(b, root, tag)
        val audit = Dq.scanChecks(TimeTravel.readStaged(spark, root, tag),
          Seq(Dq.rowRule("null_event_type", col("event_type").isNull)))
        if (Dq.passes(audit)) TimeTravel.publishStaged(spark, root, tag): Unit
        else TimeTravel.abortStaged(spark, root, tag)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000): Unit

    assert(TimeTravel.currentVersion(spark, root) == 1,
      "exactly one clean micro-batch must have published")
    val clean = e.filter(pmod(col("event_id"), lit(2)) === 0)
    assert(TimeTravel.readLatest(spark, root).count() == clean.count())
    // nothing of the corrupt batch leaked, staged or published
    assert(!new java.io.File(s"$root/data").listFiles()
      .exists(_.getName.startsWith("stage-")), "aborted stage left behind")
  }

  test("streaming windowed t-digest quantiles hold the rank bound") {
    // the sketch's streaming execution: same windowed aggregate over
    // readStream + watermark. Estimates are merge-order-dependent
    // (micro-batch partials merge in arrival order), so equality with
    // the batch twin is NOT the contract — the rank bound is: every
    // streamed estimate must rank within eps of its target against
    // the exact per-window values.
    val qs = Seq(0.5, 0.9)
    val streamed = runToCompletion(
      streamedEvents
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(graft.functions.TDigestSketch(200, qs, col("value")).as("est"),
          count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("ws_us"),
          col("event_type"), col("est"), col("n")),
      "stream_tdigest_t", "complete")
    val exact = Tables.events(spark, sf)
      .withColumn("ws_us", unix_micros(window(col("ts"), "1 hour")("start")))
      .select("ws_us", "event_type", "value").collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (k, rs) => k -> rs.map(_.getDouble(2)).sorted }
    val rows = streamed.collect()
    assert(rows.nonEmpty)
    var checked = 0
    for (r <- rows) {
      val key = (r.getLong(0), r.getString(1))
      val vals = exact(key)
      assert(r.getLong(3) === vals.length.toLong,
        s"$key: streamed window count diverges")
      for ((q, i) <- qs.zipWithIndex) {
        val e = r.getSeq[Double](2)(i)
        val lo = vals.count(_ < e); val hi = vals.count(_ <= e)
        val t = q * vals.length
        val eps = 0.02 * vals.length + 2.0
        assert(t >= lo - eps && t <= hi + eps,
          s"$key q=$q: est $e ranks [$lo,$hi] vs target $t")
        checked += 1
      }
    }
    assert(checked >= 2 * rows.length)
  }

  test("streaming space-saving top-k equals the batch twin") {
    val streamed = runToCompletion(
      streamedEvents
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(graft.functions.SpaceSaving.topk(64, 3, col("event_type"))
          .as("top"))
        .select(unix_micros(col("window.start")).as("ws_us"),
          posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("ws_us"), col("pos"),
          col("t._1").as("event_type"), col("t._2").as("cnt")),
      "stream_topk_t", "complete")
    val batch = SparkEntry.registry("stream_topk").fn(spark, sf)
      .select(unix_micros(col("window_start")).as("ws_us"),
        (col("rank") - 1).cast("int").as("pos"), col("event_type"), col("cnt"))
    assert(canon(streamed) == canon(batch))
  }

  test("streaming KMV sketch distinct equals the batch twin") {
    val streamed = runToCompletion(
      streamedEvents
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(graft.functions.Kmv(4096, xxhash64(col("user_id")))
          .as("approx_uniq"))
        .select(col("window.start").as("window_start"), col("approx_uniq")),
      "stream_kmv_uniq_t", "complete")
    val batch = SparkEntry.registry("stream_kmv_uniq").fn(spark, sf)
    assert(canon(streamed) == canon(batch))
  }

  test("streaming windowed exact-distinct equals the batch twin") {
    val streamed = runToCompletion(
      streamedEvents
        .withWatermark("ts", "1 hour")
        .select(window(col("ts"), "1 hour").as("w"), col("user_id"))
        .dropDuplicates("w", "user_id")
        .groupBy("w")
        .agg(count(lit(1)).as("uniq_users"))
        .select(col("w.start").as("window_start"), col("uniq_users")),
      "stream_uniq_t", "complete")
    val batch = SparkEntry.registry("stream_uniq_window").fn(spark, sf)
      .select("window_start", "uniq_users")
    assert(canon(streamed) == canon(batch))
  }

  test("stream-stream interval self-join equals the batch join") {
    // purchases joined to the same user's clicks in the preceding hour
    def shape(df: org.apache.spark.sql.DataFrame) = {
      val p = df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
      val c = df.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      (p, c)
    }
    val (sp, sc) = shape(streamedEvents)
    val joined = sp.withWatermark("p_ts", "2 hours")
      .join(sc.withWatermark("c_ts", "2 hours"),
        sp("user_id") === sc("user_id") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select(sp("user_id"), col("p_id"), col("c_id"))
    val streamed = runToCompletion(joined, "stream_join_t", "append")
    val (bp, bc) = shape(Tables.events(spark, sf))
    val batch = bp.join(bc,
        bp("user_id") === bc("user_id") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select(bp("user_id"), col("p_id"), col("c_id"))
    assert(canon(streamed) == canon(batch))
  }

  test("foreachBatch -> Sink composition is exactly-once under epoch replay") {
    import graft.sources.Sink
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_stream_sink"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val backend = new Sink.LocalBackend(root)
    val cfg = Sink.SinkConfig(root, "sessions", batchSize = 10000)
    val sinkFn = Sink.batchToSink(cfg, backend)

    // Capture each epoch's rows PER PARTITION so the replay below
    // reproduces what Structured Streaming does on restart: the same
    // epoch, same data, same partitioning.
    val captured = scala.collection.mutable.Map
      .empty[Long, Array[Array[org.apache.spark.sql.Row]]]
    var sessionSchema: org.apache.spark.sql.types.StructType = null
    val q = Sessionize.streaming(
        streamedEvents
          .withWatermark("ts", "2 hours")
          .select("user_id", "event_id", "ts_us", "value", "ts")
          .as[Sessionize.Ev])
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        sessionSchema = b.schema
        captured(epoch) = b.rdd.glom().collect()
        sinkFn(b, epoch)
      }
      .start()
    q.processAllAvailable()
    q.stop()

    def readBack = spark.read.schema(sessionSchema).json(s"$root/sessions")
    val firstRows = canon(readBack)
    assert(firstRows.nonEmpty, "stream wrote nothing through the sink")

    // Replay the largest epoch exactly as a restarted query would:
    // same epoch id, same rows, same partition layout. Batch keys are
    // epoch-namespaced, so the replay overwrites its own files.
    val (epoch, parts) = captured.filter(_._2.exists(_.nonEmpty)).maxBy(_._1)
    val rdd = spark.sparkContext
      .parallelize(0 until parts.length, math.max(parts.length, 1))
      .mapPartitionsWithIndex((i, _) => parts(i).iterator)
    sinkFn(spark.createDataFrame(rdd, sessionSchema), epoch)
    assert(canon(readBack) == firstRows,
      "epoch replay changed the sink contents (duplicates or loss)")
  }

  test("foreachBatch -> typed JDBC sink lands sessions exactly-once") {
    import graft.sources.{JdbcBackend, Sink}
    val dbDir = s"${System.getProperty("java.io.tmpdir")}/graft_stream_jdbc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dbDir))
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val backend = new JdbcBackend(url)
    val cfg = Sink.SinkConfig("", "sessions", batchSize = 10000)
    val sinkFn = Sink.batchToTypedSink(cfg, backend)

    val captured = scala.collection.mutable.Map
      .empty[Long, Array[Array[org.apache.spark.sql.Row]]]
    var schema: org.apache.spark.sql.types.StructType = null
    val q = Sessionize.streaming(
        streamedEvents
          .withWatermark("ts", "2 hours")
          .select("user_id", "event_id", "ts_us", "value", "ts")
          .as[Sessionize.Ev])
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        schema = b.schema
        captured(epoch) = b.rdd.glom().collect()
        sinkFn(b, epoch)
      }
      .start()
    q.processAllAvailable()
    q.stop()

    def jdbcCount: Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT count(*) FROM sessions")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    val n = jdbcCount
    assert(n > 0, "stream wrote no sessions to JDBC")

    // Epoch replay, as a restarted query would re-run it.
    val (epoch, parts) = captured.filter(_._2.exists(_.nonEmpty)).maxBy(_._1)
    val rdd = spark.sparkContext
      .parallelize(0 until parts.length, math.max(parts.length, 1))
      .mapPartitionsWithIndex((i, _) => parts(i).iterator)
    sinkFn(spark.createDataFrame(rdd, schema), epoch)
    assert(jdbcCount == n,
      "JDBC epoch replay changed the row count (duplicates or loss)")
  }

  test("kill-and-replay: crash after sink write, restart from checkpoint into typed JDBC sink is exactly-once") {
    import graft.sources.{JdbcBackend, Sink}
    // Composes the two recovery properties proved separately above:
    // epoch-replay idempotency of the typed sink AND checkpoint
    // restart. The injected crash lands at the worst point — AFTER
    // the Derby write succeeded, BEFORE Structured Streaming commits
    // the epoch — so the restarted query MUST replay that epoch
    // against a sink that already holds its rows.
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_killreplay"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val dataDir = s"$base/data"; val ckpt = s"$base/ckpt"
    val url = s"jdbc:derby:$base/db;create=true"
    val backend = new JdbcBackend(url)
    val cfg = Sink.SinkConfig("", "events_kr", batchSize = 10000)
    val sinkFn = Sink.batchToTypedSink(cfg, backend)

    val e = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_us", "value")
    e.filter(pmod(col("event_id"), lit(2)) === 0)
      .coalesce(1).write.mode("append").parquet(dataDir)
    Thread.sleep(1100)
    e.filter(pmod(col("event_id"), lit(2)) === 1)
      .coalesce(1).write.mode("append").parquet(dataDir)

    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(injectCrash: Boolean): Option[Throwable] = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dataDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, epoch: Long) =>
          sinkFn(b, epoch)
          if (injectCrash && crashed.compareAndSet(false, true))
            throw new RuntimeException(
              "injected kill: after sink write, before epoch commit")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try { q.awaitTermination(120000); None }
      catch { case t: Throwable => Some(t) }
      finally if (q.isActive) q.stop()
    }

    def jdbcCount: Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT count(*) FROM events_kr")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }

    val err = run(injectCrash = true)
    assert(err.isDefined && crashed.get(), "run 1 must die on the injected kill")
    val afterCrash = jdbcCount
    assert(afterCrash > 0,
      "the kill must land AFTER the sink write (rows present, epoch uncommitted)")

    assert(run(injectCrash = false).isEmpty, "restart must drain cleanly")
    // exactly-once: the replayed epoch overwrote its own rows (the
    // epoch-namespaced batch key), the new epoch added only file 2
    assert(jdbcCount == e.count(),
      s"kill-and-replay broke exactly-once: ${jdbcCount} vs ${e.count()}")
  }

  test("streaming sessionization (flatMapGroupsWithState) equals batch") {
    val streamed = runToCompletion(
      Sessionize.streaming(
        streamedEvents
          .withWatermark("ts", "2 hours")
          .select("user_id", "event_id", "ts_us", "value", "ts")
          .as[Sessionize.Ev]),
      "stream_session_t", "append")
    val batch = SparkEntry.registry("stream_session").fn(spark, sf)
    // the stream never sees end-of-input, so sessions still open at
    // the final watermark are not emitted; every emitted session must
    // match the batch result, and coverage must be high.
    val sRows = canon(streamed)
    val bRows = canon(batch)
    val bSet = bRows.toSet
    assert(sRows.nonEmpty, "stream emitted nothing")
    assert(sRows.forall(bSet.contains),
      s"stream emitted a session not in batch: ${sRows.find(r => !bSet.contains(r))}")
    assert(sRows.size >= (bRows.size * 0.8).toInt,
      s"stream emitted only ${sRows.size} of ${bRows.size} sessions")
  }

  test("streaming CDC upsert (update mode) converges to the batch snapshot") {
    val streamed = runToCompletion(
      Upsert.stream(
        streamedEvents
          .select("user_id", "event_id", "ts_us", "event_type", "value", "ts")
          .as[Upsert.Ev]),
      "stream_cdc_upsert_t", "update")
    // the update-mode memory sink retains EVERY emitted upsert; a
    // key's final state is its highest-version row (n_versions grows
    // strictly per emission for a key)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("n_versions").desc)
    val finalState = streamed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val batch = SparkEntry.registry("stream_cdc_upsert").fn(spark, sf)
    assert(canon(finalState) == canon(batch),
      "streamed upsert snapshot diverges from the batch fold")
    // genuinely incremental: keys spanning micro-batches emitted more
    // than one upsert along the way
    assert(streamed.count() > batch.count(), "no incremental upserts observed")
  }

  // ---- UNBOUNDED (Kafka-shaped) source seam --------------------------
  // Every case above streams from FILES; real CH ETL ingests an
  // unbounded partitioned log. These cases run the same registered
  // operators over a MemoryStream of (kpart, koffset)-keyed records —
  // synthetic Kafka partitions with per-partition monotone offsets,
  // rows interleaved ACROSS partitions within each delivery (the
  // cross-partition disorder the one-file-per-trigger source never
  // produces) — proving the watermark/state/sink-key logic carries no
  // file-source assumption. Zero-egress honest: no broker, the seam
  // is the unbounded source API itself.

  /** Events as a Kafka-shaped record stream: kpart = user_id mod 3,
    * koffset monotone per partition in event-time order, delivered in
    * the same time-quartile rounds the file staging uses (watermark
    * advances between rounds, exactly like file pickup).
    */
  private lazy val keyedRounds: Seq[Seq[KEv]] = {
    val e = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_us", "value")
    val qs = e.stat.approxQuantile("ts_us", Array(0.25, 0.5, 0.75), 0.0)
    val bounds = (Long.MinValue +: qs.map(_.toLong)) :+ Long.MaxValue
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("kpart").orderBy("ts_us", "event_id")
    val all = e.withColumn("kpart", pmod(col("user_id"), lit(3)).cast("int"))
      .withColumn("koffset", row_number().over(w).cast("long"))
      .collect().map(r => KEv(r.getAs[Int]("kpart"), r.getAs[Long]("koffset"),
        r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_us"),
        r.getAs[Double]("value")))
    (0 until 4).map { i =>
      all.filter(k => k.ts_us > bounds(i) && k.ts_us <= bounds(i + 1))
        // interleave partitions within the round: sort by offset FIRST
        .sortBy(k => (k.koffset, k.kpart)).toSeq
    }
  }

  /** Feed the rounds through a MemoryStream and drain the query after
    * each — one watermark advance per round. Returns the sink table.
    */
  private def runUnbounded(mk: DataFrame => DataFrame, name: String,
      mode: String): (DataFrame, Int) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KEv]
    val df = mk(ms.toDF().withColumn("ts", timestamp_micros(col("ts_us"))))
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    var batches = 0
    for (round <- keyedRounds) {
      ms.addData(round)
      q.processAllAvailable()
      batches += 1
    }
    q.stop()
    (spark.table(name), batches)
  }

  test("windowed agg over an unbounded keyed-offset source equals the batch query") {
    val (streamed, rounds) = runUnbounded(
      df => df
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          graft.Dec.dsum(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value")),
      "unbounded_window_agg_t", "complete")
    assert(rounds == 4)
    val batch = SparkEntry.registry("stream_window_agg").fn(spark, sf)
    assert(canon(streamed) == canon(batch),
      "unbounded-source windowed agg diverges from batch")
  }

  test("CDC upsert over the unbounded source converges to the batch snapshot") {
    val (streamed, _) = runUnbounded(
      df => Upsert.stream(df
        .select("user_id", "event_id", "ts_us", "event_type", "value", "ts")
        .as[Upsert.Ev]).toDF(),
      "unbounded_cdc_upsert_t", "update")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("n_versions").desc)
    val finalState = streamed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val batch = SparkEntry.registry("stream_cdc_upsert").fn(spark, sf)
    assert(canon(finalState) == canon(batch),
      "unbounded-source upsert snapshot diverges from the batch fold")
    // genuinely incremental across the unbounded rounds
    assert(streamed.count() > batch.count(),
      "no incremental upserts observed over the unbounded source")
  }

  test("epoch-replayed sink over the unbounded source stays exactly-once") {
    import graft.sources.Sink
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_unbounded_sink"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val backend = new Sink.LocalBackend(root)
    val cfg = Sink.SinkConfig(root, "sessions_ub", batchSize = 10000)
    val sinkFn = Sink.batchToSink(cfg, backend)
    val captured = scala.collection.mutable.Map
      .empty[Long, Array[Array[org.apache.spark.sql.Row]]]
    var sessionSchema: org.apache.spark.sql.types.StructType = null

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KEv]
    val q = Sessionize.streaming(
        ms.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", "2 hours")
          .select("user_id", "event_id", "ts_us", "value", "ts")
          .as[Sessionize.Ev])
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        sessionSchema = b.schema
        captured(epoch) = b.rdd.glom().collect()
        sinkFn(b, epoch)
      }
      .start()
    for (round <- keyedRounds) { ms.addData(round); q.processAllAvailable() }
    q.stop()

    def readBack = spark.read.schema(sessionSchema).json(s"$root/sessions_ub")
    val firstRows = canon(readBack)
    assert(firstRows.nonEmpty, "unbounded stream wrote nothing through the sink")
    // replay the largest epoch exactly as a restarted query would —
    // the sink's epoch-namespaced keys must keep it exactly-once
    val (epoch, parts) = captured.filter(_._2.exists(_.nonEmpty)).maxBy(_._1)
    val rdd = spark.sparkContext
      .parallelize(0 until parts.length, math.max(parts.length, 1))
      .mapPartitionsWithIndex((i, _) => parts(i).iterator)
    sinkFn(spark.createDataFrame(rdd, sessionSchema), epoch)
    assert(canon(readBack) == firstRows,
      "epoch replay over the unbounded source changed the sink contents")
  }

  test("stream-stream interval join equals the batch join") {
    val v = streamedEvents.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"), col("ts_us").as("view_us"))
      .withWatermark("view_ts", "2 hours")
    val c = streamedEvents.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("ts_us").as("click_us"))
      .withWatermark("click_ts", "2 hours")
    val joined = v.join(c,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_us"), col("click_us"))
    // inner stream-stream join emits matches eagerly; the interval
    // condition + watermarks bound both sides' join state
    val streamed = runToCompletion(joined, "stream_join_reg_t", "append")
    val batch = SparkEntry.registry("stream_join").fn(spark, sf)
    assert(canon(streamed) == canon(batch))
  }

  test("RocksDB state store: upsert state rows == live keys; windowed-agg state evicted by the watermark") {
    // the 100-TB streaming question is STATE GROWTH per watermark
    // advance. Under the RocksDB provider (the at-scale backend —
    // state lives off-heap per executor, not in the JVM heap), the
    // two stateful flagship shapes must hold their bounds:
    //  - CDC upsert: one state row per LIVE KEY at completion, never
    //    O(events) (n_versions folds in place);
    //  - append-mode windowed agg: the watermark EVICTS closed
    //    windows as event time advances, so final state rows sit
    //    well under the total window count.
    // tools/StreamState measures the same bounds per-batch across a
    // GenData decade (STREAM_STATE_r13.json); this pins them in CI.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def lastStateRows(df: DataFrame, mode: String): Long = {
        val q = df.writeStream.format("noop").outputMode(mode).start()
        q.processAllAvailable()
        val rows = q.recentProgress.toSeq
          .filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators(0).numRowsTotal)
        q.stop()
        rows.lastOption.getOrElse(-1L)
      }
      val ev = Tables.events(spark, sf)
      val liveKeys = ev.select("user_id").distinct().count()
      val totalWindows = ev
        .select(window(col("ts"), "1 hour"), col("event_type"))
        .distinct().count()
      val cdcRows = lastStateRows(
        Upsert.stream(streamedEvents
          .select("user_id", "event_id", "ts_us", "event_type", "value", "ts")
          .as[Upsert.Ev]).toDF(), "update")
      assert(cdcRows == liveKeys,
        s"upsert state rows $cdcRows != live keys $liveKeys")
      val aggRows = lastStateRows(
        streamedEvents.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n")), "append")
      assert(aggRows >= 0 && aggRows < totalWindows,
        s"watermark evicted nothing: $aggRows of $totalWindows windows live")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}

/** A Kafka-shaped record: (kpart, koffset) stand in for the broker's
  * (partition, offset) — per-partition monotone, interleaved across
  * partitions in delivery. Top-level so the Dataset encoder needs no
  * outer instance.
  */
case class KEv(kpart: Int, koffset: Long, event_id: Long, user_id: Long,
    event_type: String, ts_us: Long, value: Double)
