package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Format-level proofs for the Delta `_delta_log` implementation:
  * version-N reads must see EXACTLY the files the log's add/remove
  * actions imply (the spec computes the expected active set from the
  * raw JSON itself, independent of the replayer), old versions must
  * survive overwrites untouched, partition values must round-trip,
  * and the checkpoint path must reproduce full replay bit-exactly.
  */
class DeltaLogSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_spec_$name"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    root
  }

  /** Active file set as of v, computed straight from the JSON lines —
    * a second, independent implementation of the replay rule.
    */
  private def rawActiveSet(root: String, asOf: Long): Set[String] = {
    val active = scala.collection.mutable.Set[String]()
    for (v <- 0L to asOf) {
      val src = scala.io.Source.fromFile(
        f"$root/_delta_log/$v%020d.json", "UTF-8")
      try src.getLines().filter(_.trim.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("add")) active += n.get("add").get("path").asText()
        if (n.has("remove")) active -= n.get("remove").get("path").asText()
      } finally src.close()
    }
    active.toSet
  }

  test("version-N reads see exactly the add/remove-implied file set") {
    val root = freshRoot("delta_exact")
    val o = Tables.orders(spark, sf)
    val a = o.filter(col("o_orderkey") % 3 === 0)
    val b = o.filter(col("o_orderkey") % 3 === 1)
    val c = o.filter(col("o_orderkey") % 3 === 2)
    DeltaLog.commitAppend(a.repartition(2), root)   // v0: 2 files
    DeltaLog.commitAppend(b, root)                  // v1: + b's files
    DeltaLog.commitOverwrite(c, root)               // v2: removes all, adds c

    for (v <- 0L to 2L) {
      val snap = DeltaLog.snapshotAsOf(spark, root, v)
      assert(snap.files.toSet === rawActiveSet(root, v),
        s"replayer's active set diverges from the raw log at v$v")
    }
    val s0 = DeltaLog.snapshotAsOf(spark, root, 0)
    val s1 = DeltaLog.snapshotAsOf(spark, root, 1)
    val s2 = DeltaLog.snapshotAsOf(spark, root, 2)
    assert(s0.files.size === 2, "repartition(2) append must add 2 files")
    assert(s0.files.toSet.subsetOf(s1.files.toSet), "append reuses v0 files")
    assert(s2.files.toSet.intersect(s1.files.toSet).isEmpty,
      "overwrite's active set shares no file with the replaced version")

    // row-level: versions read their snapshot's content exactly
    assert(DeltaLog.readVersion(spark, root, 0).count() === a.count())
    assert(DeltaLog.readVersion(spark, root, 1).count() === a.count() + b.count())
    assert(DeltaLog.readVersion(spark, root, 2).count() === c.count())
    // overwrite never rewrote v0's files: same content, byte-stable
    assert(DeltaLog.readVersion(spark, root, 0)
      .agg(sum("o_orderkey")).head.getLong(0) ===
      a.agg(sum("o_orderkey")).head.getLong(0))
  }

  test("publish is atomic: no tmp files, contiguous 20-digit names") {
    val root = freshRoot("delta_atomic")
    val o = Tables.orders(spark, sf).limit(100)
    DeltaLog.commitAppend(o, root)
    DeltaLog.commitAppend(o, root)
    val names = new java.io.File(s"$root/_delta_log").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")) // hadoop .crc sidecars
      .sorted.toSeq
    assert(names === Seq("00000000000000000000.json", "00000000000000000001.json"))
    assert(!new java.io.File(s"$root/_delta_log").listFiles()
      .map(_.getName).exists(_.endsWith(".tmp")), "tmp file left behind")
  }

  test("partitioned commits record partitionValues and round-trip rows") {
    val root = freshRoot("delta_part")
    val o = Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
    DeltaLog.commitAppend(o, root, partitionBy = Seq("o_year"))
    val snap = DeltaLog.snapshotAsOf(spark, root, 0)
    assert(snap.partitionColumns === Seq("o_year"))
    assert(snap.files.nonEmpty &&
      snap.files.forall(_.matches("o_year=\\d+/.*\\.parquet")),
      s"partitioned data files must live under o_year=<v>/: ${snap.files.take(3)}")
    // add actions carry partitionValues matching the directory
    val src = scala.io.Source.fromFile(
      s"$root/_delta_log/00000000000000000000.json", "UTF-8")
    val adds = try src.getLines().filter(_.contains("\"add\""))
      .map(mapper.readTree).toList finally src.close()
    adds.foreach { n =>
      val a = n.get("add")
      val dirVal = a.get("path").asText().split('/')(0).split('=')(1)
      assert(a.get("partitionValues").get("o_year").asText() === dirVal)
    }
    // rows round-trip including the partition column
    val back = DeltaLog.readLatest(spark, root)
    assert(back.schema.fieldNames.toSeq === snap.schema.fieldNames.toSeq)
    assert(back.count() === o.count())
    val gotYears = back.groupBy("o_year").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expYears = o.groupBy("o_year").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotYears === expYears)
  }

  test("distributed stats collection (>16 staged files) matches the log") {
    // past 16 files commit() gathers add.stats as one Spark job over
    // the staged paths instead of a serial driver loop — same stats,
    // O(files/cores) wall-clock. Pin: every add still carries stats,
    // per-file numRecords sums to the table count, and the global
    // min/max over per-file stats equals the table's true min/max.
    val root = freshRoot("delta_stats_dist")
    val o = Tables.orders(spark, sf)
    DeltaLog.commitAppend(o.repartition(24), root) // 24 files > 16
    val snap = DeltaLog.snapshotAsOf(spark, root, 0)
    assert(snap.adds.size === 24)
    assert(snap.adds.forall(_.stats.isDefined), "every add must carry stats")
    val sts = snap.adds.map(a => mapper.readTree(a.stats.get))
    assert(sts.map(_.get("numRecords").asLong()).sum === o.count())
    val mins = sts.map(_.get("minValues").get("o_orderkey").asLong())
    val maxs = sts.map(_.get("maxValues").get("o_orderkey").asLong())
    val (expMin, expMax) = {
      val r = o.agg(min("o_orderkey"), max("o_orderkey")).head
      (r.getLong(0), r.getLong(1))
    }
    assert(mins.min === expMin && maxs.max === expMax)
  }

  test("checkpoint replay equals full JSON replay") {
    val root = freshRoot("delta_cp")
    val o = Tables.orders(spark, sf)
    for (k <- 0 to 3)
      DeltaLog.commitAppend(o.filter(col("o_orderkey") % 5 === k), root)
    val cpV = DeltaLog.writeCheckpoint(spark, root)
    assert(cpV === 3L)
    assert(DeltaLog.lastCheckpointVersion(spark, root) === Some(3L))
    DeltaLog.commitAppend(o.filter(col("o_orderkey") % 5 === 4), root)

    val latest = DeltaLog.currentVersion(spark, root)
    val viaCp = DeltaLog.snapshotAsOf(spark, root, latest, useCheckpoint = true)
    val full = DeltaLog.snapshotAsOf(spark, root, latest, useCheckpoint = false)
    assert(viaCp.files.toSet === full.files.toSet)
    assert(viaCp.schema === full.schema)
    // a time travel BELOW the checkpoint must ignore it
    val v1 = DeltaLog.snapshotAsOf(spark, root, 1, useCheckpoint = true)
    assert(v1.files.toSet === rawActiveSet(root, 1))
  }

  test("add.stats data skipping: pruned read opens fewer files, same rows") {
    val root = freshRoot("delta_skip")
    val o = Tables.orders(spark, sf)
    // commit in 4 orderkey slices so each file covers a DISJOINT
    // o_orderkey range — the shape stats pruning exists for
    val n = o.count()
    for (k <- 0 until 4)
      DeltaLog.commitAppend(
        o.filter(col("o_orderkey") >= lit(k * n / 4) &&
          col("o_orderkey") < lit((k + 1) * n / 4)).coalesce(1), root)
    val v = DeltaLog.currentVersion(spark, root)
    val snap = DeltaLog.snapshotAsOf(spark, root, v)
    assert(snap.adds.size === 4)
    assert(snap.adds.forall(_.stats.isDefined), "every add must carry stats")
    // stats carry numRecords + min/max for the key column
    val st = mapper.readTree(snap.adds.head.stats.get)
    assert(st.get("numRecords").asLong() > 0)
    assert(st.get("minValues").has("o_orderkey"))
    assert(st.get("maxValues").has("o_orderkey"))

    // a range inside slice 1 must prune to exactly 1 file
    val lo = n / 4 + 5; val hi = n / 4 + 50
    val ranges = Seq(DeltaLog.ColRange("o_orderkey", Some(lo), Some(hi)))
    assert(DeltaLog.pruneFiles(snap, ranges).size === 1,
      "disjoint-range files must prune to the single covering file")
    // and on a STRING column too (statuses overlap, so no pruning —
    // but an impossible range prunes everything)
    assert(DeltaLog.pruneFiles(snap,
      Seq(DeltaLog.ColRange("o_orderstatus", Some("Z"), None))).isEmpty)

    // exactness: pruned read == unpruned read + filter
    val pruned = DeltaLog.readVersionPruned(spark, root, v, ranges)
    val full = DeltaLog.readVersion(spark, root, v)
      .filter(col("o_orderkey").between(lo, hi))
    assert(pruned.count() === full.count())
    assert(pruned.agg(sum("o_orderkey")).head.getLong(0) ===
      full.agg(sum("o_orderkey")).head.getLong(0))
    // timestamp-typed skipping: a window outside any file's range is empty
    val tsRanges = Seq(DeltaLog.ColRange("o_orderdate", Some("2030-01-01"), None))
    assert(DeltaLog.pruneFiles(snap, tsRanges).isEmpty)
    // a DATE-ONLY bound carrying an explicit offset ("2030-01-01Z" =
    // UTC midnight) must parse, not silently disable pruning by
    // throwing into fileAdmits' keep-on-error net (r10 ADVICE: the
    // instant-honoring rewrite dropped the old stripSuffix("Z") path)
    val tsZ = Seq(DeltaLog.ColRange("o_orderdate", Some("2030-01-01Z"), None))
    assert(DeltaLog.pruneFiles(snap, tsZ).isEmpty,
      "date-only+offset bound must still prune")
  }

  test("checkpoint of a partitioned table carries partitionValues and tombstones") {
    val root = freshRoot("delta_cp_part")
    val o = Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
    DeltaLog.commitAppend(o.filter(col("o_year") <= 1997), root,
      partitionBy = Seq("o_year"))
    DeltaLog.commitAppend(o.filter(col("o_year") > 1997), root,
      partitionBy = Seq("o_year"))
    DeltaLog.commitOverwrite(o.filter(col("o_year") === 1995), root,
      partitionBy = Seq("o_year")) // v2: tombstones for v0+v1's files
    DeltaLog.writeCheckpoint(spark, root)

    // the checkpoint parquet itself must carry partitionValues on adds
    // and the removed files as remove tombstones — that is what a
    // FOREIGN reader of our checkpoint consumes
    val cpDf = spark.read.parquet(
      s"$root/_delta_log/${"%020d".format(2)}.checkpoint.parquet")
    val addRows = cpDf.filter(col("add").isNotNull)
      .select(col("add.path"), col("add.partitionValues"), col("add.stats"))
      .collect()
    assert(addRows.nonEmpty)
    addRows.foreach { r =>
      val dirVal = r.getString(0).split('/')(0).split('=')(1)
      assert(r.getMap[String, String](1).get("o_year").contains(dirVal),
        "checkpoint add.partitionValues must match the directory value")
      assert(r.getString(2) != null, "checkpoint add must carry stats")
    }
    val tombs = cpDf.filter(col("remove").isNotNull).count()
    assert(tombs > 0, "checkpoint must carry the overwrite's tombstones")

    // read-through-checkpoint == full replay (files AND schema)
    val latest = DeltaLog.currentVersion(spark, root)
    val viaCp = DeltaLog.snapshotAsOf(spark, root, latest, useCheckpoint = true)
    val full = DeltaLog.snapshotAsOf(spark, root, latest, useCheckpoint = false)
    assert(viaCp.files.toSet === full.files.toSet)
    assert(viaCp.tombstones.toMap === full.tombstones.toMap)
    assert(viaCp.schema === full.schema)
    assert(DeltaLog.readLatest(spark, root).count() ===
      o.filter(col("o_year") === 1995).count())
  }

  test("commit retries past a concurrent writer (injected collision)") {
    val root = freshRoot("delta_race1")
    val o = Tables.orders(spark, sf).limit(200)
    DeltaLog.commitAppend(o, root) // v0
    // simulate a concurrent winner: v1 already exists when we commit
    val foreign = new java.io.File(s"$root/_delta_log/${"%020d".format(1)}.json")
    val w = new java.io.FileWriter(foreign)
    try w.write("""{"commitInfo":{"operation":"WRITE","engineInfo":"rival"}}""" + "\n")
    finally w.close()
    val v = DeltaLog.commitAppend(o, root)
    assert(v === 2L, "commit must detect the occupied version and land at N+1")
    assert(DeltaLog.readVersion(spark, root, 2).count() === 2 * o.count())
  }

  test("two concurrent commitAppend writers both land, as consecutive versions") {
    val root = freshRoot("delta_race2")
    val o = Tables.orders(spark, sf).filter(col("o_orderkey") < 600)
    DeltaLog.commitAppend(o.filter(col("o_orderkey") < 100), root) // v0
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fa = Future(DeltaLog.commitAppend(o.filter(col("o_orderkey") % 2 === 0), root))
    val fb = Future(DeltaLog.commitAppend(o.filter(col("o_orderkey") % 2 === 1), root))
    val va = Await.result(fa, 120.seconds)
    val vb = Await.result(fb, 120.seconds)
    assert(Set(va, vb) === Set(1L, 2L),
      s"both writers must land as consecutive versions, got ($va, $vb)")
    val expected = o.filter(col("o_orderkey") < 100).count() + o.count()
    assert(DeltaLog.readLatest(spark, root).count() === expected,
      "no commit may be lost: both racers' rows must be present")
  }

  test("nullCount pruning: IS NULL / IS NOT NULL skip provably-irrelevant files") {
    val root = freshRoot("delta_nulls")
    val s = spark
    import s.implicits._
    // file 1: no nulls; file 2: some null; file 3: ALL null
    DeltaLog.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "tag").coalesce(1), root)
    DeltaLog.commitAppend(Seq((3L, "c"), (4L, null)).toDF("id", "tag").coalesce(1), root)
    DeltaLog.commitAppend(
      Seq((5L, null: String), (6L, null: String)).toDF("id", "tag").coalesce(1), root)
    val v = DeltaLog.currentVersion(spark, root)
    val snap = DeltaLog.snapshotAsOf(spark, root, v)
    assert(snap.adds.size === 3)
    // IS NULL: the no-null file is provably irrelevant
    val isNull = Seq(DeltaLog.ColRange("tag", isNull = Some(true)))
    assert(DeltaLog.pruneFiles(snap, isNull).size === 2)
    assert(DeltaLog.readVersionPruned(spark, root, v, isNull)
      .collect().map(_.getLong(0)).toSet === Set(4L, 5L, 6L))
    // IS NOT NULL: the all-null file is provably irrelevant
    val notNull = Seq(DeltaLog.ColRange("tag", isNull = Some(false)))
    assert(DeltaLog.pruneFiles(snap, notNull).size === 2)
    assert(DeltaLog.readVersionPruned(spark, root, v, notNull)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("commit hammer: 4 racing writers x 4 commits, no commit lost") {
    // The r8 publish used rename + read-back verification, which had a
    // residual ABA on overwriting-rename filesystems: two racers could
    // BOTH verify their own bytes at version N and one commit silently
    // vanished. The hard-link put-if-absent (publishNew) makes the
    // kernel arbitrate exactly one winner; this hammer drives enough
    // same-version contention that the old scheme's window is actually
    // exercised, and asserts the invariant that matters: every commit
    // lands, at a distinct version, and the final replay sees all rows.
    val root = freshRoot("delta_hammer")
    val o = Tables.orders(spark, sf).filter(col("o_orderkey") < 1600)
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futures = (0 until 4).map { w =>
      Future {
        (0 until 4).map { i =>
          DeltaLog.commitAppend(
            o.filter(col("o_orderkey") % 16 === lit(w * 4 + i)), root)
        }
      }
    }
    val versions = futures.flatMap(Await.result(_, 300.seconds))
    assert(versions.toSet === (0L until 16L).toSet,
      s"16 commits must land as versions 0..15, got ${versions.sorted}")
    assert(DeltaLog.readLatest(spark, root).count() === o.count(),
      "a racing writer's commit was silently dropped")
  }

  test("timestamp stats pruning agrees with the row filter in a non-UTC session") {
    // fileStats renders TimestampType min/max as UTC wall-clock; the
    // query bound arrives as SESSION wall-clock. In a UTC+9 session
    // the unconverted comparison judged a file disjoint when its rows
    // actually match (instants [bound-9h, bound) were silently
    // dropped). pruneFiles now re-renders the bound in UTC first.
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "Asia/Tokyo")
      val root = freshRoot("delta_tz")
      val s = spark
      import s.implicits._
      // Tokyo 09:00 == UTC 00:00 — the regime where the two renderings
      // straddle the bound below
      val df = Seq(1L, 2L, 3L).toDF("id")
        .withColumn("ev", lit("2024-01-01 09:00:00").cast("timestamp"))
      DeltaLog.commitAppend(df.coalesce(1), root)
      val v = DeltaLog.currentVersion(spark, root)
      // bound Tokyo 05:00 (= UTC 2023-12-31T20:00): rows match, but the
      // UTC-rendered stats max (00:00) sorts BELOW the unconverted
      // bound string — the old compare pruned the file
      val ranges = Seq(DeltaLog.ColRange("ev", Some("2024-01-01T05:00:00"), None))
      val pruned = DeltaLog.readVersionPruned(spark, root, v, ranges)
      assert(pruned.count() === 3L,
        "file wrongly pruned: stats (UTC) compared against a session-TZ bound")
      // and the prune still fires when no instant can match
      val none = Seq(DeltaLog.ColRange("ev", Some("2030-01-01"), None))
      assert(DeltaLog.readVersionPruned(spark, root, v, none).count() === 0L)
    } finally spark.conf.set(tzKey, saved)
  }

  test("%XX partition-value unescaping decodes UTF-8 byte sequences") {
    // multi-byte escapes (a foreign writer escaping non-ASCII) must
    // decode as ONE UTF-8 sequence, not per-byte chars (mojibake)
    assert(DeltaLog.unescape("caf%C3%A9") === "café")
    assert(DeltaLog.unescape("%E2%82%AC99") === "€99")
    // single-byte escapes and literals unchanged
    assert(DeltaLog.unescape("a%3Ab%25c") === "a:b%c")
    assert(DeltaLog.unescape("plain") === "plain")
    // and the full write path round-trips Spark-escaped special chars
    // (the container's JVM cannot create non-ASCII paths, so the
    // on-disk case exercises ASCII escapes; the decoder above covers
    // the multi-byte form a foreign log would carry)
    val root = freshRoot("delta_esc")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("a:b c", 1L),
        org.apache.spark.sql.Row("a:b c", 2L),
        org.apache.spark.sql.Row("plain", 3L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("city",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
    DeltaLog.commitAppend(df, root, partitionBy = Seq("city"))
    val snap = DeltaLog.snapshotAsOf(spark, root, 0)
    val vals = snap.adds.flatMap(_.partitionValues.get("city")).toSet
    assert(vals === Set("a:b c", "plain"),
      s"partitionValues must decode the writer's %XX escapes, got $vals")
    assert(DeltaLog.readLatest(spark, root)
      .filter(col("city") === "a:b c").count() === 2)
  }

  test("schema round-trips through schemaString") {
    val root = freshRoot("delta_schema")
    val o = Tables.orders(spark, sf).limit(10)
    DeltaLog.commitAppend(o, root)
    assert(DeltaLog.snapshotAsOf(spark, root, 0).schema === o.schema)
    assert(DeltaLog.readLatest(spark, root).schema === o.schema)
  }

  test("distributed checkpoint pruning equals driver replay pruning exactly") {
    val root = freshRoot("delta_distprune")
    val o = Tables.orders(spark, sf)
    // partitioned table with stats, checkpoint mid-history, then
    // post-checkpoint adds AND a remove — the distributed path must
    // honor overrides from the JSON deltas, not just checkpoint rows
    DeltaLog.commitAppend(o.filter(col("o_orderkey") % 4 === 0),
      root, Seq("o_orderpriority"))
    DeltaLog.commitAppend(o.filter(col("o_orderkey") % 4 === 1),
      root, Seq("o_orderpriority"))
    val cpv = DeltaLog.writeCheckpoint(spark, root)
    assert(cpv === 1L)
    DeltaLog.commitAppend(o.filter(col("o_orderkey") % 4 === 2),
      root, Seq("o_orderpriority"))
    // CoW-remove one pre-checkpoint file (rewrite it into a new one)
    val v2snap = DeltaLog.snapshotAsOf(spark, root, 2)
    val victim = DeltaLog.snapshotAsOf(spark, root, 0).adds.head
    DeltaLog.commitRewrite(
      DeltaLog.readVersion(spark, root, 2)
        .limit(0), // rewrite to empty: pure remove, max override stress
      root, 2, Seq(victim.path), Seq("o_orderpriority"))
    val v = DeltaLog.currentVersion(spark, root)
    assert(v === 3L)
    val queries = Seq(
      Seq(DeltaLog.ColRange("o_totalprice", lower = Some(150000))),
      Seq(DeltaLog.ColRange("o_orderpriority",
        lower = Some("1-URGENT"), upper = Some("1-URGENT"))),
      Seq(DeltaLog.ColRange("o_orderstatus", isNull = Some(false))),
      Seq.empty[DeltaLog.ColRange])
    for (ranges <- queries) {
      val driver = DeltaLog.pruneFiles(
        DeltaLog.snapshotAsOf(spark, root, v), ranges)
      val dist = DeltaLog.prunedSnapshotViaCheckpoint(
        spark, root, v, ranges)
      assert(dist.isDefined, "checkpoint path must engage")
      assert(dist.get.adds.map(_.path).toSet === driver.map(_.path).toSet,
        s"distributed prune diverges from driver prune for $ranges")
      // and the full pruned read equals the unpruned read + filter
      val got = DeltaLog.readVersionPruned(spark, root, v, ranges)
        .collect().map(_.toString).sorted
      val want = ranges.foldLeft(DeltaLog.readVersion(spark, root, v)) {
        (df, rg) =>
          val lo = rg.lower.map(b =>
            col(rg.column) >= lit(b.toString).cast(df.schema(rg.column).dataType))
          val hi = rg.upper.map(b =>
            col(rg.column) <= lit(b.toString).cast(df.schema(rg.column).dataType))
          val nn = rg.isNull.map(w =>
            if (w) col(rg.column).isNull else col(rg.column).isNotNull)
          (lo.toSeq ++ hi.toSeq ++ nn.toSeq).foldLeft(df)(_.filter(_))
      }.collect().map(_.toString).sorted
      assert(got.toSeq === want.toSeq,
        s"pruned read rows diverge for $ranges")
    }
    // the victim file is gone from both paths
    assert(!DeltaLog.prunedSnapshotViaCheckpoint(spark, root, v, Nil)
      .get.adds.map(_.path).contains(victim.path))
  }

  test("append racing an overwrite: stale-snapshot append aborts, table stays coherent") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = freshRoot("delta_conflict_ao")
    val o = Tables.orders(spark, sf)
    DeltaLog.commitAppend(o.filter(col("o_orderkey") % 3 === 0), root) // v0
    // transaction T reads the table at v0 ...
    val readV = DeltaLog.currentVersion(spark, root)
    // ... while a second writer overwrites it (own thread — the race)
    val ow = Future(DeltaLog.commitOverwrite(
      o.filter(col("o_orderkey") % 3 === 1), root))
    val v1 = Await.result(ow, 120.seconds)
    assert(v1 === 1L)
    // T's append must ABORT: the snapshot it assumed was removed
    intercept[java.util.ConcurrentModificationException] {
      DeltaLog.commitAppend(o.filter(col("o_orderkey") % 3 === 2), root,
        readVersion = Some(readV))
    }
    // the overwrite's state is intact, nothing from T leaked in
    assert(DeltaLog.currentVersion(spark, root) === 1L)
    assert(DeltaLog.readLatest(spark, root).count() ===
      o.filter(col("o_orderkey") % 3 === 1).count())
    // a BLIND append (no read snapshot) commutes and still lands —
    // the WriteSerializable default
    val v2 = DeltaLog.commitAppend(o.filter(col("o_orderkey") % 3 === 2), root)
    assert(v2 === 2L)
    assert(DeltaLog.readLatest(spark, root).count() ===
      o.filter(col("o_orderkey") % 3 =!= 0).count())
  }

  test("blind append retries past a mid-race overwrite instead of aborting") {
    val root = freshRoot("delta_blind_race")
    val o = Tables.orders(spark, sf).limit(200)
    DeltaLog.commitAppend(o, root) // v0
    // occupy v1 with a rival OVERWRITE (remove actions included): the
    // blind append enters at parent=v0, loses the publish race for v1,
    // and on retry sees a remover landed mid-race. Under Delta's
    // WriteSerializable rules a blind append COMMUTES with it — it
    // referenced no existing file — so it must retry and land, not
    // abort (r10 ADVICE: only a declared readVersion makes removes a
    // conflict for appends).
    val removedPaths = DeltaLog.snapshotAsOf(spark, root, 0).files
    val foreign = new java.io.File(s"$root/_delta_log/${"%020d".format(1)}.json")
    val w = new java.io.FileWriter(foreign)
    try {
      w.write("""{"commitInfo":{"operation":"OVERWRITE","engineInfo":"rival"}}""" + "\n")
      removedPaths.foreach(p => w.write(
        s"""{"remove":{"path":"$p","deletionTimestamp":0}}""" + "\n"))
    } finally w.close()
    val v = DeltaLog.commitAppend(o, root)
    assert(v === 2L, "blind append must land past the rival overwrite")
    // the rival removed v0's files, so the table is exactly the append
    assert(DeltaLog.readLatest(spark, root).count() === o.count())
  }

  test("CoW rewrite: read-set conflict aborts, disjoint rewrites both commit") {
    val root = freshRoot("delta_conflict_rw")
    val o = Tables.orders(spark, sf)
    val a = o.filter(col("o_orderkey") % 2 === 0)
    val b = o.filter(col("o_orderkey") % 2 === 1)
    DeltaLog.commitAppend(a.repartition(1), root) // v0: file A
    DeltaLog.commitAppend(b.repartition(1), root) // v1: file B
    val readV = DeltaLog.currentVersion(spark, root)
    val snap = DeltaLog.snapshotAsOf(spark, root, readV)
    assert(snap.files.size === 2)
    val fileA = DeltaLog.snapshotAsOf(spark, root, 0).files.head
    val fileB = snap.files.filterNot(_ == fileA).head
    // two CoW transactions at the same read snapshot, DISJOINT file
    // sets (per-partition compactions): both must commit
    val v2 = DeltaLog.commitRewrite(a.repartition(1), root, readV, Seq(fileA))
    val v3 = DeltaLog.commitRewrite(b.repartition(1), root, readV, Seq(fileB))
    assert(v2 === 2L && v3 === 3L)
    assert(DeltaLog.readLatest(spark, root).count() === o.count())
    // a third rewrite whose READ SET was superseded by v2 must abort:
    // committing remove(fileA)+add would resurrect pre-v2 rows
    intercept[java.util.ConcurrentModificationException] {
      DeltaLog.commitRewrite(a.repartition(1), root, readV, Seq(fileA))
    }
    assert(DeltaLog.currentVersion(spark, root) === 3L)
    assert(DeltaLog.readLatest(spark, root).count() === o.count())
  }
  test("deletion vectors: MOR stacking, time travel, checkpoint survival, pruned read") {
    import org.apache.spark.sql.functions._
    val root = freshRoot("delta_dv")
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice")
    val n = li.count()
    DeltaLog.commitAppend(li.repartition(4), root)

    // vector 1: delete the R rows
    val nR = li.filter(col("l_returnflag") === "R").count()
    val v1 = DeltaLog.commitDeleteWhere(spark, root,
      col("l_returnflag") === "R")
    assert(DeltaLog.readLatest(spark, root).count() === n - nR,
      "vector 1 did not delete exactly the R rows")
    assert(DeltaLog.readLatest(spark, root)
      .filter(col("l_returnflag") === "R").count() === 0L)
    // time travel: version 0 still reads everything
    assert(DeltaLog.readVersion(spark, root, 0).count() === n,
      "vector leaked into the pre-delete version")

    // vector 2 stacks: the replacement descriptor must carry the
    // union (this is the stacking rule commitDeleteWhere documents)
    val nA45 = li.filter(col("l_returnflag") === "A" &&
      col("l_quantity") >= 45.0).count()
    DeltaLog.commitDeleteWhere(spark, root,
      col("l_returnflag") === "A" && col("l_quantity") >= 45.0)
    val expect2 = n - nR - nA45
    assert(DeltaLog.readLatest(spark, root).count() === expect2,
      "vectors did not stack")

    // checkpoint survival: replay from the checkpoint alone must keep
    // both vectors (the dv descriptor rides in the checkpoint's add
    // struct)
    DeltaLog.writeCheckpoint(spark, root)
    assert(DeltaLog.readLatest(spark, root).count() === expect2,
      "checkpointed read lost deletion vectors")
    // ... and through the DISTRIBUTED pruned-checkpoint path too
    val pruned = DeltaLog.readVersionPruned(spark, root,
      DeltaLog.currentVersion(spark, root),
      Seq(DeltaLog.ColRange("l_quantity", lower = Some(1))))
    assert(pruned.count() === expect2,
      "pruned checkpoint read lost deletion vectors")
    assert(pruned.filter(col("l_returnflag") === "R").count() === 0L)

    // a delete matching nothing is a no-op commit
    val vNoop = DeltaLog.commitDeleteWhere(spark, root,
      col("l_returnflag") === "Z")
    assert(vNoop === DeltaLog.currentVersion(spark, root))

    // overwrite resets: replaced table carries no stale vectors
    DeltaLog.commitOverwrite(li.filter(col("l_returnflag") === "R"), root)
    assert(DeltaLog.readLatest(spark, root).count() === nR,
      "overwrite did not clear the deletion vectors")
    assert(v1 === 1L)
  }

  test("DV compaction folds vectors into clean files, scoped to vector-carrying files") {
    import org.apache.spark.sql.functions._
    val root = freshRoot("delta_dv_compact")
    val o = spark.range(0, 3000).toDF("k")
    // three files with disjoint ranges; deletes will touch two
    for (i <- 0 until 3)
      DeltaLog.commitAppend(
        o.filter(col("k") >= i * 1000 && col("k") < (i + 1) * 1000)
          .repartition(1), root)
    val preFiles = DeltaLog.snapshotAsOf(spark, root,
      DeltaLog.currentVersion(spark, root)).files.toSet
    val vDel = DeltaLog.commitDeleteWhere(spark, root,
      col("k") < 300 || (col("k") >= 1000 && col("k") < 1200))
    val expect = (0L until 3000L)
      .filterNot(k => k < 300 || (k >= 1000 && k < 1200)).toSet
    assert(DeltaLog.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == expect)

    val vC = DeltaLog.compactDeletionVectors(spark, root)
    val snap = DeltaLog.snapshotAsOf(spark, root, vC)
    // vectors are gone from the current snapshot, rows unchanged
    assert(snap.adds.forall(_.dv.isEmpty),
      "compaction left dv descriptors in the current snapshot")
    assert(DeltaLog.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == expect,
      "compaction changed the visible rows")
    // SCOPED copy-on-write: the untouched third file survives by name
    val postFiles = snap.files.toSet
    val kept = preFiles.intersect(postFiles)
    assert(kept.size === 1,
      s"expected exactly the vector-free file kept, got $kept")
    // time travel: the pre-compact MOR version still applies vectors,
    // and the pre-delete version still reads everything
    assert(DeltaLog.readVersion(spark, root, vDel)
      .collect().map(_.getLong(0)).toSet == expect)
    assert(DeltaLog.readVersion(spark, root, vDel - 1).count() === 3000L)
    // compacting a vector-free table is a no-op version-wise
    assert(DeltaLog.compactDeletionVectors(spark, root) === vC)
  }

  test("high-file-count metadata: measured driver cost, distributed prune holds survivors only") {
    // The loadCheckpoint scaladoc states a ~200-400 B/file driver
    // ceiling ESTIMATE; this measures it on a synthetic 100k-file
    // table (state reconstruction never opens data files, so the adds
    // are metadata-only) and pins the scale path: the DISTRIBUTED
    // checkpoint prune must hand the driver only the survivors, never
    // the full file list. Measurement lands in DELTA_METADATA_r12.json.
    val root = freshRoot("delta_manyfiles")
    val n = 100000
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType)))
      .json.replace("\"", "\\\"")
    val sb = new StringBuilder(n * 220)
    sb ++= s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
              |{"metaData":{"id":"many-files-test","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["p"],"configuration":{}}}
              |""".stripMargin
    for (i <- 0 until n)
      sb ++= s"""{"add":{"path":"p=${i % 50}/part-$i.parquet","partitionValues":{"p":"${i % 50}"},"size":1024,"modificationTime":0,"dataChange":true,"stats":"{\\"numRecords\\":1,\\"minValues\\":{\\"k\\":$i},\\"maxValues\\":{\\"k\\":$i},\\"nullCount\\":{\\"k\\":0}}"}}""" + "\n"
    val out = f.create(new org.apache.hadoop.fs.Path(
      s"$root/_delta_log/00000000000000000000.json"), true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()

    def usedHeap(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
    }
    // driver replay of the 100k-add JSON log -> checkpoint
    val h0 = usedHeap()
    val t0 = System.nanoTime()
    val snap = DeltaLog.snapshotAsOf(spark, root, 0)
    val replaySec = (System.nanoTime() - t0) / 1e9
    assert(snap.adds.size === n)
    val h1 = usedHeap()
    val bytesPerFile = math.max(0L, h1 - h0).toDouble / n
    DeltaLog.writeCheckpoint(spark, root)

    // full driver checkpoint replay (the documented ceiling path)
    val t1 = System.nanoTime()
    val snapCp = DeltaLog.snapshotAsOf(spark, root, 0)
    val cpSec = (System.nanoTime() - t1) / 1e9
    assert(snapCp.adds.size === n)

    // the scale path: distributed prune over the checkpoint — only
    // survivors reach the driver (10 of 100k by stats, and partition
    // pruning composes on top)
    val t2 = System.nanoTime()
    val pruned = DeltaLog.prunedSnapshotViaCheckpoint(spark, root, 0,
      Seq(DeltaLog.ColRange("k", Some(10), Some(19))))
    val pruneSec = (System.nanoTime() - t2) / 1e9
    assert(pruned.isDefined, "distributed prune path not taken")
    assert(pruned.get.adds.size === 10,
      s"expected 10 survivors, got ${pruned.get.adds.size}")
    // heap math is GC-noisy: assert only a loose sanity ceiling, and
    // commit the measured numbers as the artifact
    assert(bytesPerFile < 5000.0,
      f"AddFile driver footprint implausible: $bytesPerFile%.0f B/file")
    info(f"n=$n replay=$replaySec%.1fs cpReplay=$cpSec%.1fs " +
      f"prune=$pruneSec%.1fs ~$bytesPerFile%.0f B/file")
    // Refresh the COMMITTED artifact only on an explicit evidence run
    // (SPARK_GRAFT_REFRESH_EVIDENCE=1): an ordinary `sbt test` must
    // not silently rewrite committed evidence — timings vary run to
    // run, and SurveyIntegritySpec pins the §8 prose to the committed
    // numbers, so a drive-by rewrite guarantees prose drift. The
    // plain-run measurement still lands in target/evidence/.
    val refresh = sys.env.get("SPARK_GRAFT_REFRESH_EVIDENCE").contains("1")
    val dest =
      if (refresh) java.nio.file.Paths.get("DELTA_METADATA_r12.json")
      else {
        val d = java.nio.file.Paths.get("target", "evidence")
        java.nio.file.Files.createDirectories(d)
        d.resolve("DELTA_METADATA_r12.json")
      }
    java.nio.file.Files.write(
      dest,
      (f"""{"metric":"delta_metadata_ceiling","n_files":$n,""" +
        f""""json_replay_sec":$replaySec%.2f,""" +
        f""""checkpoint_replay_sec":$cpSec%.2f,""" +
        f""""distributed_prune_sec":$pruneSec%.2f,""" +
        f""""prune_survivors":10,""" +
        f""""measured_bytes_per_addfile":${bytesPerFile}%.0f,""" +
        f""""note":"driver holds one AddFile per active file on the replay paths; the distributed prune path holds survivors only - the 100-TB answer for small-file-riddled tables"}%n""")
        .getBytes("UTF-8"))
  }

  test("a new deletion vector carries only the AFFECTED files' positions") {
    // the stacking rule is per-file: a later delete touching file B
    // must not re-materialize file A's delete history into its vector
    // — otherwise every vector (and its read-side broadcast) grows
    // with TOTAL table deletes instead of the affected files' deletes
    import org.apache.spark.sql.functions._
    val root = freshRoot("delta_dv_scope")
    val o = spark.range(0, 2000).toDF("o_orderkey")
    // two appends -> two data files with disjoint key ranges
    DeltaLog.commitAppend(
      o.filter(col("o_orderkey") < 1000).repartition(1), root)
    DeltaLog.commitAppend(
      o.filter(col("o_orderkey") >= 1000).repartition(1), root)
    val fileA = DeltaLog.snapshotAsOf(spark, root, 0).files.head
    def dvFiles(): Set[String] = {
      val d = new java.io.File(s"$root/_dv")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    // delete 1 hits only file A
    DeltaLog.commitDeleteWhere(spark, root,
      col("o_orderkey") < 500)
    val dv1 = dvFiles()
    assert(dv1.size === 1)
    // delete 2 hits only file B: its vector must reference file B alone
    DeltaLog.commitDeleteWhere(spark, root,
      col("o_orderkey") >= 1500)
    val dv2 = (dvFiles() -- dv1).head
    val refs = spark.read.parquet(s"$root/_dv/$dv2")
      .select("file_name").distinct().collect().map(_.getString(0)).toSet
    assert(refs.size === 1 && !refs.contains(fileA.split('/').last),
      s"vector 2 carries other files' history: $refs")
    // and both vectors still apply on read
    val live = DeltaLog.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet
    val want = o.collect().map(_.getLong(0)).toSet
      .filter(k => k >= 500 && k < 1500)
    assert(live == want, "per-file-scoped vectors broke the read")
  }
}
