package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import graft.sources.{DeltaLog, IcebergForeign, IcebergLite}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Open-table-format on-disk interop (round 7): the Delta `_delta_log`
  * and Iceberg manifest chains implemented at the FORMAT level over
  * the engine's snapshot mechanisms — plain JSON + parquet + avro, no
  * format jars. Each entry commits real table history and reads it
  * back THROUGH the log, with the DuckDB oracle on the source table,
  * so a pass proves version-N reads see exactly the files the log's
  * add/remove actions imply. DeltaLogSpec/IcebergSpec prove the
  * layout/atomicity/tolerance halves.
  */
object Interop {

  private def tmp(dir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  /** Remove a previous run's table root. r13: the recursive delete of
    * a multi-commit table (hundreds of files) ran serially on the
    * driver INSIDE the timed query; one atomic rename moves it out of
    * the way and a daemon thread deletes the trash off the clock. The
    * new table never sees the old files (the root is gone the moment
    * rename returns). r14 (advice): leaked `.trash-*` siblings (a JVM
    * that exited before its daemon delete finished) are swept on the
    * NEXT rm() of the same root, so trash is self-healing instead of
    * accumulating across runs; catches are NonFatal only.
    */
  private def rm(s: SparkSession, root: String): Unit = {
    import scala.util.control.NonFatal
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val stale =
      try {
        val parent = p.getParent
        if (parent != null && fs.exists(parent))
          fs.listStatus(parent).toSeq.map(_.getPath)
            .filter(_.getName.startsWith(p.getName + ".trash-"))
        else Seq.empty
      } catch { case NonFatal(_) => Seq.empty }
    val live = fs.exists(p)
    val renamed =
      if (live) {
        val trash = new org.apache.hadoop.fs.Path(
          root + ".trash-" + java.util.UUID.randomUUID().toString.take(8))
        if (fs.rename(p, trash)) Some(trash)
        else { fs.delete(p, true); None } // rename refused: fall back inline
      } else None
    val toDelete = stale ++ renamed
    if (toDelete.nonEmpty) {
      val t = new Thread(() => {
        toDelete.foreach(d => try fs.delete(d, true)
          catch { case NonFatal(_) => () })
      })
      t.setDaemon(true)
      t.start()
    }
  }

  private def yearly(df: DataFrame, v: Int): DataFrame =
    df.groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .withColumn("version", lit(v))

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Delta _delta_log round-trip with time travel across add AND
    // remove actions: v0 appends pre-1997 orders, v1 appends the rest,
    // v2 OVERWRITES with only 1997+ (remove actions for every v1 file
    // + new adds). The query reads all three versions through log
    // replay; a pass proves appends never rewrite old files and
    // overwrite's removes drop exactly the previously-active set.
    // ------------------------------------------------------------------
    // Delta DELETION VECTORS (v2 merge-on-read, DeltaLog's lite form):
    // rows deleted by committing a (file, row-position) vector under
    // _dv/ and re-adding each affected file with a deletionVector
    // descriptor — remove+re-add of the SAME path, a metadata-only
    // commit, no data file rewritten (sink_delete_mutation is the
    // copy-on-write twin that rewrites files). Readers apply vectors
    // as a broadcast anti-join on the scan's (file, row_index)
    // metadata key. Output proves both halves: version 1 aggregates
    // the pre-delete snapshot via time travel, version 2 the
    // MOR-applied current table; the oracle recomputes both from raw
    // rows, so wrong positions = wrong rows = hash mismatch.
    "src_delta_dv" -> Q(
      (s, dir) => {
        val root = tmp(dir, "delta_dv")
        rm(s, root)
        val li = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
            "l_extendedprice")
        DeltaLog.commitAppend(li.repartition(4), root)
        DeltaLog.commitDeleteWhere(s, root,
          col("l_returnflag") === "R" && col("l_quantity") >= 45.0)
        def agg(df: DataFrame, v: Int) =
          df.groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
            .withColumn("version", lit(v))
        agg(DeltaLog.readVersion(s, root, 0), 1)
          .unionByName(agg(DeltaLog.readLatest(s, root), 2))
          .select("version", "l_returnflag", "n", "total")
          .orderBy("version", "l_returnflag")
      },
      Some(s"""
        SELECT 1 AS version, l_returnflag, count(*) AS n,
               ${S.dsum("l_extendedprice")} AS total
        FROM lineitem GROUP BY 2
        UNION ALL
        SELECT 2, l_returnflag, count(*), ${S.dsum("l_extendedprice")}
        FROM lineitem
        WHERE NOT (l_returnflag = 'R' AND l_quantity >= 45.0)
        GROUP BY 2
        ORDER BY version, l_returnflag""")),

    // ------------------------------------------------------------------
    // Deletion-vector COMPACTION — the third leg of the MOR lifecycle
    // (delete writes a vector, reads anti-join it, compaction folds it
    // back into clean files): after compactDeletionVectors the current
    // snapshot carries no dv descriptors and only vector-carrying
    // files were rewritten. Output pins the full arc — version 1 the
    // pre-delete snapshot, version 2 the POST-COMPACTION table (which
    // must equal the MOR view it replaced) — plus an in-query guard
    // that descriptors are gone; the oracle recomputes both from raw
    // rows, so a fold that loses or resurrects rows hash-mismatches.
    "src_delta_dv_compact" -> Q(
      (s, dir) => {
        val root = tmp(dir, "delta_dv_compact")
        rm(s, root)
        val li = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
            "l_extendedprice")
        DeltaLog.commitAppend(li.repartition(4), root)
        DeltaLog.commitDeleteWhere(s, root,
          col("l_returnflag") === "R" && col("l_quantity") >= 45.0)
        val vC = DeltaLog.compactDeletionVectors(s, root)
        require(DeltaLog.snapshotAsOf(s, root, vC).adds.forall(_.dv.isEmpty),
          "compaction left deletion-vector descriptors")
        def agg(df: DataFrame, v: Int) =
          df.groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
            .withColumn("version", lit(v))
        agg(DeltaLog.readVersion(s, root, 0), 1)
          .unionByName(agg(DeltaLog.readLatest(s, root), 2))
          .select("version", "l_returnflag", "n", "total")
          .orderBy("version", "l_returnflag")
      },
      Some(s"""
        SELECT 1 AS version, l_returnflag, count(*) AS n,
               ${S.dsum("l_extendedprice")} AS total
        FROM lineitem GROUP BY 2
        UNION ALL
        SELECT 2, l_returnflag, count(*), ${S.dsum("l_extendedprice")}
        FROM lineitem
        WHERE NOT (l_returnflag = 'R' AND l_quantity >= 45.0)
        GROUP BY 2
        ORDER BY version, l_returnflag""")),

    "src_delta_log" -> Q(
      (s, dir) => {
        val root = tmp(dir, "deltalog")
        rm(s, root)
        val o = Tables.orders(s, dir)
        val pre = o.filter(col("o_orderdate") < "1997-01-01")
        val post = o.filter(col("o_orderdate") >= "1997-01-01")
        val v0 = DeltaLog.commitAppend(pre, root)
        val v1 = DeltaLog.commitAppend(post, root)
        val v2 = DeltaLog.commitOverwrite(post, root)
        yearly(DeltaLog.readVersion(s, root, v0), 0)
          .unionByName(yearly(DeltaLog.readVersion(s, root, v1), 1))
          .unionByName(yearly(DeltaLog.readVersion(s, root, v2), 2))
          .select("version", "o_year", "n", "total")
          .orderBy("version", "o_year")
      },
      Some(s"""
        SELECT 0 AS version, year(o_orderdate) AS o_year, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 2
        UNION ALL
        SELECT 1, year(o_orderdate), count(*), ${S.dsum("o_totalprice")}
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 2, year(o_orderdate), count(*), ${S.dsum("o_totalprice")}
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' GROUP BY 2
        ORDER BY version, o_year""")),

    // ------------------------------------------------------------------
    // Delta checkpoint: five append commits, a parquet checkpoint
    // compacted after the fourth, one more JSON commit on top. The
    // read goes THROUGH _last_checkpoint (checkpoint parquet + one
    // JSON replay — O(commits since checkpoint), the property that
    // keeps planning flat on a long-lived table); the oracle is the
    // whole source table, so a pass proves checkpoint state + JSON
    // tail compose to exactly the full replay.
    "src_delta_checkpoint" -> Q(
      (s, dir) => {
        val root = tmp(dir, "deltacp")
        rm(s, root)
        val o = Tables.orders(s, dir)
        for (k <- 0 to 3)
          DeltaLog.commitAppend(o.filter(col("o_orderkey") % 5 === k), root)
        DeltaLog.writeCheckpoint(s, root) // compacts v0..v3
        DeltaLog.commitAppend(o.filter(col("o_orderkey") % 5 === 4), root)
        DeltaLog.readLatest(s, root)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      Some(s"""
        SELECT o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY 1 ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // FOREIGN Delta log: the log JSON is hand-written here (not by
    // DeltaLog's writer) the way another engine would write it —
    // commitInfo lines, out-of-order keys, stats/tags fields, a txn
    // action — over directly-written parquet files. v0 adds files A+B,
    // v1 removes B and adds C. Reading v0 (A∪B) and v1 (A∪C) through
    // the replayer proves format-level tolerance: unknown actions and
    // fields are ignored, and remove drops exactly B's rows.
    "src_delta_foreign" -> Q(
      (s, dir) => {
        val root = tmp(dir, "deltaforeign")
        rm(s, root)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sessionState.newHadoopConf())
        val o = Tables.orders(s, dir)
        // three single-file slices written as a foreign writer would:
        // plain parquet files at the table root, not via DeltaLog
        def slice(k: Int, name: String): Unit = {
          val stage = new org.apache.hadoop.fs.Path(root, s".s$k")
          o.filter(col("o_orderkey") % 3 === k).coalesce(1)
            .write.parquet(stage.toString)
          val part = fs.listStatus(stage)
            .map(_.getPath).find(_.getName.endsWith(".parquet")).get
          fs.rename(part, new org.apache.hadoop.fs.Path(root, name))
          fs.delete(stage, true): Unit
        }
        slice(0, "a.parquet"); slice(1, "b.parquet"); slice(2, "c.parquet")
        val schemaJson = o.schema.json.replace("\"", "\\\"")
        def write(name: String, text: String): Unit = {
          val out = fs.create(
            new org.apache.hadoop.fs.Path(s"$root/_delta_log", name), true)
          try out.write(text.getBytes("UTF-8")) finally out.close()
        }
        write("00000000000000000000.json",
          s"""{"commitInfo":{"operation":"WRITE","engineInfo":"someOtherEngine/9.9"}}
             |{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
             |{"metaData":{"partitionColumns":[],"configuration":{},"id":"11111111-2222-3333-4444-555555555555","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson"}}
             |{"add":{"dataChange":true,"size":1,"path":"a.parquet","modificationTime":0,"partitionValues":{},"stats":"{\\"numRecords\\":1}","tags":{"writer":"foreign"}}}
             |{"add":{"path":"b.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
             |""".stripMargin)
        write("00000000000000000001.json",
          s"""{"commitInfo":{"operation":"MERGE"}}
             |{"txn":{"appId":"foreign-app","version":7}}
             |{"remove":{"path":"b.parquet","deletionTimestamp":1,"dataChange":true}}
             |{"add":{"path":"c.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
             |""".stripMargin)
        def roll(v: Int) = DeltaLog.readVersion(s, root, v)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("version", lit(v))
        roll(0).unionByName(roll(1))
          .select("version", "o_orderstatus", "n", "total")
          .orderBy("version", "o_orderstatus")
      },
      Some(s"""
        SELECT 0 AS version, o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders WHERE o_orderkey % 3 IN (0, 1) GROUP BY 2
        UNION ALL
        SELECT 1, o_orderstatus, count(*), ${S.dsum("o_totalprice")}
        FROM orders WHERE o_orderkey % 3 IN (0, 2) GROUP BY 2
        ORDER BY version, o_orderstatus""")),

    // ------------------------------------------------------------------
    // Delta add.stats DATA SKIPPING: commits write per-file min/max
    // stats (read from parquet FOOTERS at commit time — O(files)
    // metadata, no data scan) and the reader prunes files whose stats
    // or partitionValues PROVE no row matches, before any footer is
    // opened. The table is committed in four disjoint o_orderkey
    // slices, each partitioned by o_year, so the key range exercises
    // stats pruning and the year range exercises partition pruning;
    // the fn REQUIRES >=3/4 of files pruned (the scale property under
    // test), and the oracle proves the pruned read is still exact.
    "src_delta_skipping" -> Q(
      (s, dir) => {
        val root = tmp(dir, "deltaskip")
        rm(s, root)
        val o = Tables.orders(s, dir)
          .withColumn("o_year", year(col("o_orderdate")))
        val n = o.count()
        for (k <- 0 until 4)
          DeltaLog.commitAppend(
            o.filter(col("o_orderkey") >= lit(k * n / 4) &&
              col("o_orderkey") < lit((k + 1) * n / 4)),
            root, partitionBy = Seq("o_year"))
        val v = DeltaLog.currentVersion(s, root)
        val ranges = Seq(
          DeltaLog.ColRange("o_orderkey", Some(100), Some(300)),
          DeltaLog.ColRange("o_year", Some(1996), Some(1997)))
        val snap = DeltaLog.snapshotAsOf(s, root, v)
        val kept = DeltaLog.pruneFiles(snap, ranges)
        require(kept.size * 4 <= snap.adds.size,
          s"data skipping must prune >=3/4 of the files " +
            s"(kept ${kept.size} of ${snap.adds.size})")
        DeltaLog.readVersionPruned(s, root, v, ranges)
          .groupBy("o_year")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_year")
      },
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               count(*) AS n, ${S.dsum("o_totalprice")} AS total
        FROM orders
        WHERE o_orderkey BETWEEN 100 AND 300
          AND year(o_orderdate) BETWEEN 1996 AND 1997
        GROUP BY 1 ORDER BY o_year""")),

    // ------------------------------------------------------------------
    // Iceberg manifest chain: two append snapshots; each commit writes
    // ONE new avro manifest and a manifest list that REUSES the
    // parent's manifests (commit cost ∝ new files, not table size).
    // The query time-travels both snapshots through
    // metadata.json -> manifest-list avro -> manifest avro -> parquet;
    // a pass proves the chain resolves to exactly each snapshot's
    // file set and the Iceberg schema JSON round-trips.
    // ------------------------------------------------------------------
    // Iceberg v2 MERGE-ON-READ position deletes: rows are deleted by
    // committing a (data file, row position) delete vector under a
    // content=1 manifest — no data file rewritten — and every read
    // applies the vectors as a broadcast anti-join on the scan's
    // _metadata (file, row_index) key. Output proves both halves:
    // version 1 aggregates the PRE-delete snapshot (time travel
    // ignores later vectors), version 2 the post-delete table; the
    // oracle recomputes both from the raw rows. The deterministic
    // 2dp predicate makes the deleted set engine-exact.
    "src_iceberg_pos_delete" -> Q(
      (s, dir) => {
        val root = tmp(dir, "iceberg_mor")
        rm(s, root)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus",
          "o_orderpriority", "o_totalprice")
        val snap1 = IcebergLite.commitAppend(o, root)
        IcebergLite.commitPositionDeletes(s, root,
          col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
        def agg(df: org.apache.spark.sql.DataFrame, v: Int) =
          df.groupBy("o_orderstatus")
            .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
            .withColumn("version", lit(v))
        agg(IcebergLite.readSnapshot(s, root, snap1), 1)
          .unionByName(agg(IcebergLite.readLatest(s, root), 2))
          .select("version", "o_orderstatus", "n", "total")
          .orderBy("version", "o_orderstatus")
      },
      Some(s"""
        SELECT 1 AS version, o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 2, o_orderstatus, count(*), ${S.dsum("o_totalprice")}
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)
        GROUP BY 2
        ORDER BY version, o_orderstatus""")),

    // ------------------------------------------------------------------
    // Iceberg DISTRIBUTED manifest scan + data skipping: commits write
    // per-file bounds into the manifest entries (stats_json — footer
    // stats in the same JSON shape Delta's add.stats uses, so both
    // formats prune through ONE shared predicate, DeltaLog.fileAdmits),
    // and planning runs as one Spark job over the manifest avros — the
    // driver receives only SURVIVORS, never the O(files) entry list
    // the serial replay materializes (the r12 verdict's last
    // driver-serial loop). Four disjoint o_orderkey slices committed
    // separately; the fn REQUIRES >=3/4 of files pruned, the oracle
    // proves the pruned read is still exact.
    "src_iceberg_prune" -> Q(
      (s, dir) => {
        val root = tmp(dir, "iceberg_prune")
        rm(s, root)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus",
          "o_totalprice", "o_orderdate")
        val n = o.count()
        for (k <- 0 until 4)
          IcebergLite.commitAppend(
            o.filter(col("o_orderkey") >= lit(k * n / 4) &&
              col("o_orderkey") < lit((k + 1) * n / 4))
              .repartition(4),
            root)
        val snapId = IcebergLite.currentSnapshotId(s, root)
        val ranges = Seq(DeltaLog.ColRange("o_orderkey", Some(100), Some(300)))
        val all = IcebergLite.snapshotFilesDistributed(s, root, snapId)
        val kept = IcebergLite.snapshotFilesDistributed(s, root, snapId, ranges)
        require(kept.size * 4 <= all.size,
          s"manifest data skipping must prune >=3/4 of the files " +
            s"(kept ${kept.size} of ${all.size})")
        IcebergLite.readSnapshotPruned(s, root, snapId, ranges)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      Some(s"""
        SELECT o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders
        WHERE o_orderkey BETWEEN 100 AND 300
        GROUP BY 1 ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // Iceberg v2 EQUALITY deletes: rows retracted BY KEY (a parquet of
    // key rows under a content=2 manifest — no table scan at commit,
    // the CDC-retraction shape) with the spec's SEQUENCE rule: a
    // delete at sequence S drops only rows of data files committed at
    // sequence < S, so keys RE-INSERTED after the retraction survive.
    // The output pins all three behaviors — version 1 the pre-delete
    // snapshot (time travel), version 2 the post-delete + re-insert
    // table — and the oracle recomputes both from raw rows, so a
    // sequence-rule bug (re-inserted rows wrongly dropped, or old rows
    // wrongly kept) is a hash mismatch.
    "src_iceberg_eq_delete" -> Q(
      (s, dir) => {
        import s.implicits._
        val root = tmp(dir, "iceberg_eqdel")
        rm(s, root)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus",
          "o_totalprice")
        val snap1 = IcebergLite.commitAppend(o, root)
        // retract every F order by key (no positions, no scan) ...
        val fKeys = o.filter(col("o_orderstatus") === "F")
          .select("o_orderkey")
        IcebergLite.commitEqualityDeletes(s, root, fKeys)
        // ... then re-insert the even-keyed half: data at a HIGHER
        // sequence than the delete, so it must survive the read
        IcebergLite.commitAppend(
          o.filter(col("o_orderstatus") === "F" &&
            col("o_orderkey") % 2 === 0), root)
        def agg(df: DataFrame, v: Int) =
          df.groupBy("o_orderstatus")
            .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
            .withColumn("version", lit(v))
        agg(IcebergLite.readSnapshot(s, root, snap1), 1)
          .unionByName(agg(IcebergLite.readLatest(s, root), 2))
          .select("version", "o_orderstatus", "n", "total")
          .orderBy("version", "o_orderstatus")
      },
      Some(s"""
        SELECT 1 AS version, o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 2, o_orderstatus, count(*), ${S.dsum("o_totalprice")}
        FROM orders
        WHERE o_orderstatus <> 'F' OR o_orderkey % 2 = 0
        GROUP BY 2
        ORDER BY version, o_orderstatus""")),

    // ------------------------------------------------------------------
    // FOREIGN Iceberg metadata: the whole chain (metadata JSON,
    // manifest-list avro, manifest avro) is hand-written here the way
    // another engine would write it — avro fields in a DIFFERENT
    // order, extra fields (partition_spec_id, split_offsets, summary,
    // properties), non-sequential field ids, the optional
    // content/sequence_number columns ABSENT, no version-hint.text at
    // all — over directly-written parquet. Snapshot 1 = file A,
    // snapshot 2 = files A+B (the second list re-references A's
    // foreign manifest). Reading both through IcebergLite proves the
    // reader tolerates foreign layout variance instead of only
    // round-tripping its own bytes (the Delta side's
    // src_delta_foreign bar, judged missing for Iceberg in r11).
    "src_iceberg_foreign" -> Q(
      (s, dir) => {
        val root = tmp(dir, "iceberg_foreign")
        rm(s, root)
        val fsys = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sessionState.newHadoopConf())
        val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
        def slice(k: Int, name: String): Long = {
          val stage = new org.apache.hadoop.fs.Path(root, s".s$k")
          o.filter(col("o_orderkey") % 2 === k).coalesce(1)
            .write.parquet(stage.toString)
          val part = fsys.listStatus(stage)
            .map(_.getPath).find(_.getName.endsWith(".parquet")).get
          val len = fsys.getFileStatus(part).getLen
          fsys.mkdirs(new org.apache.hadoop.fs.Path(root, "data"))
          fsys.rename(part, new org.apache.hadoop.fs.Path(root, name))
          fsys.delete(stage, true)
          len
        }
        val lenA = slice(0, "data/a.parquet")
        val lenB = slice(1, "data/b.parquet")
        IcebergForeign.writeChain(s, root, lenA, lenB)
        def agg(df: DataFrame, v: Int) =
          df.groupBy("o_orderstatus")
            .agg(count(lit(1)).as("n"),
              sum(col("o_orderkey")).as("key_sum"))
            .withColumn("version", lit(v))
        agg(IcebergLite.readSnapshot(s, root, 101L), 1)
          .unionByName(agg(IcebergLite.readSnapshot(s, root, 202L), 2))
          .select("version", "o_orderstatus", "n", "key_sum")
          .orderBy("version", "o_orderstatus")
      },
      Some("""
        SELECT 1 AS version, o_orderstatus, count(*) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 2
        UNION ALL
        SELECT 2, o_orderstatus, count(*), CAST(sum(o_orderkey) AS BIGINT)
        FROM orders GROUP BY 2
        ORDER BY version, o_orderstatus""")),

    "src_iceberg_avro" -> Q(
      (s, dir) => {
        val root = tmp(dir, "iceberg")
        rm(s, root)
        val o = Tables.orders(s, dir)
        val snap1 = IcebergLite.commitAppend(
          o.filter(col("o_orderdate") < "1997-01-01"), root)
        val snap2 = IcebergLite.commitAppend(
          o.filter(col("o_orderdate") >= "1997-01-01"), root)
        yearly(IcebergLite.readSnapshot(s, root, snap1), 1)
          .unionByName(yearly(IcebergLite.readSnapshot(s, root, snap2), 2))
          .select("version", "o_year", "n", "total")
          .orderBy("version", "o_year")
      },
      Some(s"""
        SELECT 1 AS version, year(o_orderdate) AS o_year, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 2
        UNION ALL
        SELECT 2, year(o_orderdate), count(*), ${S.dsum("o_totalprice")}
        FROM orders GROUP BY 2
        ORDER BY version, o_year""")))
}
