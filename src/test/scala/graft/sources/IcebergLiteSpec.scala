package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Proofs for the Iceberg-format metadata chain: manifest REUSE
  * across snapshots (commit cost ∝ new files), snapshot file sets
  * resolved through the avro chain, and Iceberg-JSON schema
  * round-trip.
  */
class IcebergLiteSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_spec_$name"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    root
  }

  test("snapshots resolve through manifest-list -> manifest -> files, with manifest reuse") {
    val root = freshRoot("iceberg_chain")
    val o = Tables.orders(spark, sf)
    val a = o.filter(col("o_orderkey") % 2 === 0)
    val b = o.filter(col("o_orderkey") % 2 === 1)
    val snap1 = IcebergLite.commitAppend(a, root)
    val snap2 = IcebergLite.commitAppend(b, root)

    val files1 = IcebergLite.snapshotFiles(spark, root, snap1).toSet
    val files2 = IcebergLite.snapshotFiles(spark, root, snap2).toSet
    assert(files1.nonEmpty && files1.subsetOf(files2),
      "snapshot 2 must reuse snapshot 1's data files (append semantics)")
    // each commit's files live in its own writer-unique data dir
    // (OCC: concurrent writers must never collide on a data path)
    def dirsOf(fs: Set[String]): Set[String] =
      fs.map(_.split('/').dropRight(1).mkString("/"))
    assert(files1.forall(_.startsWith("data/s-")))
    assert(dirsOf(files1).size == 1)
    assert(dirsOf(files2 -- files1).size == 1)
    assert(dirsOf(files1) != dirsOf(files2 -- files1))

    // structural manifest reuse: snap2's manifest LIST references the
    // SAME manifest avro file snap1's list does — no manifest rewrite
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def listFor(snapId: Long): Set[String] = {
      val src = scala.io.Source.fromFile(
        s"$root/metadata/v${IcebergLite.currentMetaVersion(spark, root)}.metadata.json", "UTF-8")
      val meta = try mapper.readTree(src.mkString) finally src.close()
      import scala.jdk.CollectionConverters._
      val listPath = meta.get("snapshots").elements().asScala.toSeq
        .find(_.get("snapshot-id").asLong() == snapId).get
        .get("manifest-list").asText()
      val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        new java.io.File(root, listPath),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      try r.iterator().asScala.map(_.get("manifest_path").toString).toSet
      finally r.close()
    }
    val m1 = listFor(snap1)
    val m2 = listFor(snap2)
    assert(m1.size === 1 && m2.size === 2 && m1.subsetOf(m2),
      "append must add ONE manifest and reuse the parent's")

    // time travel reads exactly each snapshot's rows
    assert(IcebergLite.readSnapshot(spark, root, snap1).count() === a.count())
    assert(IcebergLite.readSnapshot(spark, root, snap2).count() === o.count())
  }

  test("commitOverwrite tombstones the parent's files (status=2) and keeps history readable") {
    val root = freshRoot("iceberg_ow")
    val o = Tables.orders(spark, sf)
    val a = o.filter(col("o_orderkey") % 3 === 0)
    val b = o.filter(col("o_orderkey") % 3 === 1)
    val c = o.filter(col("o_orderkey") % 3 === 2)
    val snap1 = IcebergLite.commitAppend(a, root)
    val snap2 = IcebergLite.commitAppend(b, root)
    val snap3 = IcebergLite.commitOverwrite(c, root)

    // live set of the overwrite snapshot = ONLY c's files
    val files3 = IcebergLite.snapshotFiles(spark, root, snap3).toSet
    val earlier = IcebergLite.snapshotFiles(spark, root, snap1).toSet ++
      IcebergLite.snapshotFiles(spark, root, snap2).toSet
    assert(files3.nonEmpty && files3.intersect(earlier).isEmpty,
      s"overwrite's live set must be only the new files: $files3")
    // history intact: older snapshots still read their own data
    assert(IcebergLite.readSnapshot(spark, root, snap1).count() === a.count())
    assert(IcebergLite.readSnapshot(spark, root, snap2).count() === a.count() + b.count())
    assert(IcebergLite.readSnapshot(spark, root, snap3).count() === c.count())
    assert(IcebergLite.readLatest(spark, root).count() === c.count())

    // the delete manifest exists and tombstones exactly the parent's
    // live files as status=2 entries
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val delManifest = f.listStatus(new org.apache.hadoop.fs.Path(root, "metadata"))
      .map(_.getPath.getName).find(_.endsWith("-deletes.avro"))
    assert(delManifest.isDefined, "overwrite must write a delete manifest")
    val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      new java.io.File(s"$root/metadata/${delManifest.get}"),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    import scala.jdk.CollectionConverters._
    val tombstoned =
      try r.iterator().asScala.map { e =>
        assert(e.get("status").asInstanceOf[Int] === 2)
        e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("file_path").toString
      }.toSet
      finally r.close()
    assert(tombstoned === IcebergLite.snapshotFiles(spark, root, snap2).toSet,
      "delete manifest must tombstone exactly the parent's live files")
  }

  test("two concurrent committers both land as consecutive snapshots") {
    // r8 left the Iceberg commit last-writer-wins (version-hint
    // overwrite): two racers could build the same v and one snapshot
    // silently vanished. The commit point is now put-if-absent on
    // v{N}.metadata.json with a re-read-parent retry loop — the same
    // optimistic-concurrency shape DeltaLog.commit got in r8.
    val root = freshRoot("iceberg_race")
    val o = Tables.orders(spark, sf).filter(col("o_orderkey") < 400)
    IcebergLite.commitAppend(o.filter(col("o_orderkey") < 100), root)
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fa = Future(IcebergLite.commitAppend(
      o.filter(col("o_orderkey") % 2 === 0), root))
    val fb = Future(IcebergLite.commitAppend(
      o.filter(col("o_orderkey") % 2 === 1), root))
    val sa = Await.result(fa, 120.seconds)
    val sb = Await.result(fb, 120.seconds)
    assert(Set(sa, sb) === Set(2L, 3L),
      s"both writers must land as consecutive snapshots, got ($sa, $sb)")
    assert(IcebergLite.currentMetaVersion(spark, root) === 2)
    val expected = o.filter(col("o_orderkey") < 100).count() + o.count()
    assert(IcebergLite.readLatest(spark, root).count() === expected,
      "no commit may be lost: both racers' rows must be present")
    // and the loser's history stayed coherent: every snapshot readable
    Seq(1L, sa, sb).foreach { sid =>
      assert(IcebergLite.readSnapshot(spark, root, sid).count() > 0)
    }
  }

  test("time travel across a schema change reads each snapshot with its own schema") {
    val root = freshRoot("iceberg_schemaevo")
    val o = Tables.orders(spark, sf).limit(50)
    val v1 = o.select(col("o_orderkey"), col("o_totalprice"))
    val v2 = o.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderstatus")) // schema WIDENS between commits
    val snap1 = IcebergLite.commitAppend(v1, root)
    val snap2 = IcebergLite.commitAppend(v2, root)

    val r1 = IcebergLite.readSnapshot(spark, root, snap1)
    assert(r1.schema.fieldNames.toSeq === Seq("o_orderkey", "o_totalprice"),
      "older snapshot must read under the schema it was WRITTEN with")
    assert(r1.count() === 50)
    val r2 = IcebergLite.readSnapshot(spark, root, snap2)
    assert(r2.schema.fieldNames.toSeq ===
      Seq("o_orderkey", "o_totalprice", "o_orderstatus"))
    assert(r2.count() === 100)
    // both schemas live in the schemas array with distinct ids
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val src = scala.io.Source.fromFile(
      s"$root/metadata/v${IcebergLite.currentMetaVersion(spark, root)}.metadata.json", "UTF-8")
    val meta = try mapper.readTree(src.mkString) finally src.close()
    import scala.jdk.CollectionConverters._
    val ids = meta.get("schemas").elements().asScala
      .map(_.get("schema-id").asInt()).toSeq
    assert(ids.distinct.size === 2,
      s"schemas array must accumulate both schemas, got ids $ids")
  }

  test("Iceberg schema JSON round-trips to the Spark schema") {
    val root = freshRoot("iceberg_schema")
    val o = Tables.orders(spark, sf).limit(10)
    IcebergLite.commitAppend(o, root)
    val back = IcebergLite.readLatest(spark, root)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      o.schema.map(f => (f.name, f.dataType)))
    assert(back.count() === 10)
  }

  test("append racing an overwrite: stale-snapshot append aborts, blind append lands") {
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val root = freshRoot("iceberg_conflict_ao")
    val o = Tables.orders(spark, sf).filter(col("o_orderkey") < 400)
    IcebergLite.commitAppend(o.filter(col("o_orderkey") % 3 === 0), root) // v0
    // transaction T reads the table at metadata v0 ...
    val readV = IcebergLite.currentMetaVersion(spark, root)
    // ... while a second writer overwrites it (own thread — the race)
    val ow = Future(IcebergLite.commitOverwrite(
      o.filter(col("o_orderkey") % 3 === 1), root))
    Await.result(ow, 120.seconds): Unit
    // T's append must ABORT: the live set it assumed was tombstoned
    intercept[java.util.ConcurrentModificationException] {
      IcebergLite.commitAppend(o.filter(col("o_orderkey") % 3 === 2), root,
        readVersion = Some(readV))
    }
    // the overwrite's state is intact; nothing from T leaked in
    assert(IcebergLite.currentMetaVersion(spark, root) === 1)
    assert(IcebergLite.readLatest(spark, root).count() ===
      o.filter(col("o_orderkey") % 3 === 1).count())
    // a BLIND append (no read snapshot) commutes and still lands
    IcebergLite.commitAppend(o.filter(col("o_orderkey") % 3 === 2), root): Unit
    assert(IcebergLite.readLatest(spark, root).count() ===
      o.filter(col("o_orderkey") % 3 =!= 0).count())
  }
  test("position deletes: MOR semantics — stacking vectors, time travel, append, overwrite reset") {
    val root = freshRoot("iceberg_posdel")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") < 900)
    val all = o.collect().map(_.getLong(0)).toSet
    val snap1 = IcebergLite.commitAppend(o.repartition(4), root)

    // vector 1: delete the F rows — count drops exactly, keys absent
    val fKeys = o.filter(col("o_orderstatus") === "F")
      .collect().map(_.getLong(0)).toSet
    IcebergLite.commitPositionDeletes(spark, root,
      col("o_orderstatus") === "F")
    val after1 = IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(after1 == all -- fKeys, "vector 1 did not delete exactly the F rows")
    // time travel: the pre-delete snapshot still reads everything
    assert(IcebergLite.readSnapshot(spark, root, snap1)
      .collect().map(_.getLong(0)).toSet == all,
      "delete vector leaked into the earlier snapshot")

    // vector 2 stacks on vector 1 (computed against the CURRENT view,
    // so positions land in the same base files)
    val oKeys = o.filter(col("o_orderstatus") === "O")
      .collect().map(_.getLong(0)).toSet
    IcebergLite.commitPositionDeletes(spark, root,
      col("o_orderstatus") === "O")
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == all -- fKeys -- oKeys,
      "vectors did not stack")

    // append after deletes: old vectors keep applying to old files,
    // appended rows are untouched (their files carry no vector)
    val extra = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") >= 900 && col("o_orderkey") < 1200)
    val extraKeys = extra.collect().map(_.getLong(0)).toSet
    assert(extraKeys.nonEmpty)
    IcebergLite.commitAppend(extra, root)
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == (all -- fKeys -- oKeys) ++ extraKeys,
      "append after deletes lost rows or resurrected deleted ones")

    // overwrite resets: replaced table carries no stale vectors
    IcebergLite.commitOverwrite(o.filter(col("o_orderstatus") === "F"), root)
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == fKeys,
      "overwrite did not clear the delete vectors")
  }

  test("equality deletes: MOR semantics — sequence ordering, re-insert, stacking, time travel, overwrite reset") {
    import graft.SparkSpec.spark.implicits._
    val root = freshRoot("iceberg_eqdel")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") < 900)
    val all = o.collect().map(_.getLong(0)).toSet
    val snap1 = IcebergLite.commitAppend(o, root)

    // delete 1: retract the F rows BY KEY (no table scan at commit)
    val fKeys = o.filter(col("o_orderstatus") === "F")
      .collect().map(_.getLong(0)).toSet
    IcebergLite.commitEqualityDeletes(spark, root,
      fKeys.toSeq.toDF("o_orderkey"))
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == all -- fKeys,
      "equality delete did not drop exactly the F keys")
    // time travel: the pre-delete snapshot still reads everything
    assert(IcebergLite.readSnapshot(spark, root, snap1)
      .collect().map(_.getLong(0)).toSet == all,
      "equality delete leaked into the earlier snapshot")

    // THE SEQUENCE RULE: re-inserting some retracted keys AFTER the
    // delete must survive — their data files carry a HIGHER sequence
    // than the delete, so the keys do not apply to them
    val reborn = o.filter(col("o_orderstatus") === "F")
      .filter(col("o_orderkey") % 2 === 0)
    val rebornKeys = reborn.collect().map(_.getLong(0)).toSet
    assert(rebornKeys.nonEmpty)
    IcebergLite.commitAppend(reborn, root)
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == (all -- fKeys) ++ rebornKeys,
      "re-inserted keys were wrongly dropped by an EARLIER equality delete")

    // delete 2 stacks (multi-column key: status+key) and applies only
    // below ITS sequence — the reborn rows it names DO die now
    val victim = rebornKeys.head
    IcebergLite.commitEqualityDeletes(spark, root,
      Seq((victim, "F")).toDF("o_orderkey", "o_orderstatus"))
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet ==
        (all -- fKeys) ++ (rebornKeys - victim),
      "stacked multi-column equality delete misapplied")

    // overwrite resets: replaced table carries no stale delete files
    // (eq-delete staleness vs a racing overwrite is guarded by the
    // same commit() read-baseline the position-delete test pins)
    IcebergLite.commitOverwrite(o.filter(col("o_orderstatus") === "F"), root)
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == fKeys,
      "overwrite did not clear the equality deletes")
  }

  test("foreign metadata chain: reordered/extra avro fields, no hint, schema-id fallback") {
    import graft.SparkSpec.spark.implicits._
    val root = freshRoot("iceberg_foreign_spec")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // two directly-written parquet files (not via IcebergLite)
    def put(name: String, rows: Seq[(Long, String)]): Long = {
      val stage = new org.apache.hadoop.fs.Path(root, s".st_$name")
      rows.toDF("o_orderkey", "o_orderstatus").coalesce(1)
        .write.parquet(stage.toString)
      val part = f.listStatus(stage).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val len = f.getFileStatus(part).getLen
      f.mkdirs(new org.apache.hadoop.fs.Path(root, "data"))
      f.rename(part, new org.apache.hadoop.fs.Path(root, s"data/$name"))
      f.delete(stage, true)
      len
    }
    val la = put("a.parquet", Seq((1L, "O"), (2L, "F")))
    val lb = put("b.parquet", Seq((3L, "P")))
    IcebergForeign.writeChain(spark, root, la, lb)
    // no version-hint.text was written: the reader must PROBE to v1
    assert(!f.exists(new org.apache.hadoop.fs.Path(
      root, "metadata/version-hint.text")))
    assert(IcebergLite.currentMetaVersion(spark, root) === 1)
    // snapshot 101 (no schema-id recorded -> current-schema fallback;
    // manifest list lacks content/sequence_number -> defaults)
    val s1 = IcebergLite.readSnapshot(spark, root, 101L)
    assert(s1.columns.toSeq == Seq("o_orderkey", "o_orderstatus"))
    assert(s1.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // snapshot 202 re-references A's foreign manifest + adds B
    assert(IcebergLite.readSnapshot(spark, root, 202L)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // and IcebergLite can COMMIT ON TOP of the foreign chain: an
    // append becomes v2 with the foreign snapshots intact
    IcebergLite.commitAppend(Seq((4L, "O")).toDF("o_orderkey", "o_orderstatus"), root)
    assert(IcebergLite.currentMetaVersion(spark, root) === 2)
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    assert(IcebergLite.readSnapshot(spark, root, 101L)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "our commit disturbed the foreign snapshot")
  }

  test("position deletes built on a stale snapshot abort when an overwrite intervened") {
    // the delete's (file_path, pos) rows reference the READ snapshot's
    // data files; if an overwrite replaced those files before the
    // commit, landing the content=1 manifest anyway would silently
    // keep the requested rows live — the commit must abort instead
    val root = freshRoot("iceberg_posdel_conflict")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") < 400)
    IcebergLite.commitAppend(o, root) // v0
    val readV = IcebergLite.currentMetaVersion(spark, root)
    val oKeys = o.filter(col("o_orderstatus") === "O")
      .collect().map(_.getLong(0)).toSet
    IcebergLite.commitOverwrite(o.filter(col("o_orderstatus") === "O"), root)
    intercept[java.util.ConcurrentModificationException] {
      IcebergLite.commitPositionDeletesAt(spark, root,
        col("o_orderstatus") === "F", readV)
    }
    // the overwrite's state is intact — nothing from the stale delete
    // leaked in
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == oKeys,
      "aborted position delete mutated the table")
    // a FRESH delete (baseline re-read inside the call) still lands
    val half = oKeys.filter(_ % 2 == 0)
    IcebergLite.commitPositionDeletes(spark, root, col("o_orderkey") % 2 === 0)
    assert(IcebergLite.readLatest(spark, root)
      .collect().map(_.getLong(0)).toSet == oKeys -- half,
      "fresh position delete after the overwrite did not apply")
  }

  test("distributed manifest scan == driver replay; manifest stats prune files; pruned MOR read stays exact") {
    val root = freshRoot("iceberg_dist")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val n = o.count()
    // four disjoint key slices, 2 files each -> per-file key bounds
    // are tight enough that a selective range must prune
    for (k <- 0 until 4)
      IcebergLite.commitAppend(
        o.filter(col("o_orderkey") >= lit(k * n / 4) &&
          col("o_orderkey") < lit((k + 1) * n / 4)).repartition(2),
        root)
    // a MOR position delete on top, so the pruned path must apply
    // vectors too
    IcebergLite.commitPositionDeletes(spark, root,
      col("o_orderkey") % 7 === 0)
    val snapId = IcebergLite.currentSnapshotId(spark, root)

    // 1) distributed == driver replay (no ranges): same live file set
    val driverFiles = IcebergLite.snapshotFiles(spark, root, snapId).toSet
    val distFiles = IcebergLite.snapshotFilesDistributed(spark, root, snapId)
    assert(distFiles.map(_._1).toSet == driverFiles,
      "distributed manifest scan diverges from the driver replay")
    // sizes come from the manifests, not a re-list
    assert(distFiles.forall(_._2 > 0L))

    // 2) a selective range hands the driver a strict subset
    val ranges = Seq(DeltaLog.ColRange("o_orderkey",
      Some(n / 4), Some(n / 4 + 50)))
    val kept = IcebergLite.snapshotFilesDistributed(spark, root, snapId, ranges)
    assert(kept.nonEmpty && kept.size * 2 <= distFiles.size,
      s"stats pruning kept ${kept.size} of ${distFiles.size} files")

    // 3) pruned read == full read + residual filter, cell-exact,
    // including the MOR vector application on the kept files
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val pruned = IcebergLite.readSnapshotPruned(spark, root, snapId, ranges)
    val full = IcebergLite.readSnapshot(spark, root, snapId)
      .filter(col("o_orderkey") >= lit(n / 4) &&
        col("o_orderkey") <= lit(n / 4 + 50))
    assert(canon(pruned) == canon(full),
      "pruned read diverges from full read + residual filter")
    // the delete actually removed rows in the probed window
    assert(pruned.filter(col("o_orderkey") % 7 === 0).count() == 0L)
  }

  test("high-file-count metadata: measured driver replay ceiling; distributed manifest scan hands the driver survivors only") {
    // The Iceberg twin of DeltaLogSpec's 100k-add measurement (the r12
    // verdict's last projected scale-killer: the manifest replay was
    // driver-serial and UNMEASURED). A synthetic 100k-file chain — 100
    // manifest avros x 1000 entries, one manifest list, one metadata
    // json — written HERE with the spec's layout (hand-rolled avro, so
    // the reader is proven against spec-shaped bytes, not our writer's
    // private object). Measurement lands in ICEBERG_METADATA_r13.json.
    val root = freshRoot("iceberg_manyfiles")
    val n = 100000
    val perManifest = 1000
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$root/metadata"))
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"record_count","type":"long"},
        |{"name":"file_size_in_bytes","type":"long"},
        |{"name":"stats_json","type":["null","string"],"default":null}]}}]}""".stripMargin)
    val listSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"added_files_count","type":"int"},
        |{"name":"content","type":"int","default":0},
        |{"name":"sequence_number","type":"long","default":0}]}""".stripMargin)
    def writeAvro(rel: String, schema: Schema, recs: Iterator[GenericRecord]): Long = {
      val out = f.create(new org.apache.hadoop.fs.Path(root, rel), true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      try recs.foreach(w.append) finally w.close()
      f.getFileStatus(new org.apache.hadoop.fs.Path(root, rel)).getLen
    }
    val manifestLens = (0 until n / perManifest).map { m =>
      val name = s"metadata/manifest-syn-$m.avro"
      name -> writeAvro(name, entrySchema,
        (0 until perManifest).iterator.map { j =>
          val i = m * perManifest + j
          val e = new GenericData.Record(entrySchema)
          e.put("status", 1)
          val d = new GenericData.Record(
            entrySchema.getField("data_file").schema())
          d.put("file_path", s"data/s-syn/part-$i.parquet")
          d.put("file_format", "PARQUET")
          d.put("record_count", 1L)
          d.put("file_size_in_bytes", 1024L)
          d.put("stats_json",
            s"""{"numRecords":1,"minValues":{"k":$i},"maxValues":{"k":$i},"nullCount":{"k":0}}""")
          e.put("data_file", d)
          e
        })
    }
    writeAvro("metadata/snap-1-syn.avro", listSchema,
      manifestLens.iterator.map { case (path, len) =>
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path", path)
        r.put("manifest_length", len)
        r.put("added_files_count", perManifest)
        r.put("content", 0)
        r.put("sequence_number", 1L)
        r
      })
    val metaJson =
      s"""{"format-version":2,"table-uuid":"00000000-0000-0000-0000-000000000001",
         |"location":"$root","current-schema-id":0,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"k","required":false,"type":"long"}]}],
         |"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,"sequence-number":1,"timestamp-ms":0,
         |"manifest-list":"metadata/snap-1-syn.avro","schema-id":0,
         |"operation":"append"}]}""".stripMargin
    val out0 = f.create(new org.apache.hadoop.fs.Path(
      s"$root/metadata/v0.metadata.json"), true)
    try out0.write(metaJson.getBytes("UTF-8")) finally out0.close()
    val outH = f.create(new org.apache.hadoop.fs.Path(
      s"$root/metadata/version-hint.text"), true)
    try outH.write("0".getBytes("UTF-8")) finally outH.close()

    def usedHeap(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
    }
    // driver-serial manifest replay (the measured ceiling)
    val h0 = usedHeap()
    val t0 = System.nanoTime()
    val files = IcebergLite.snapshotFiles(spark, root, 1L)
    val replaySec = (System.nanoTime() - t0) / 1e9
    assert(files.size === n)
    val h1 = usedHeap()
    val bytesPerFile = math.max(0L, h1 - h0).toDouble / n
    // the distributed scan, unpruned: same file set, computed by one
    // Spark job (wall-clock comparable; the driver still collects n
    // rows here — the point of this row is plan-cost parity)
    val t1 = System.nanoTime()
    val distAll = IcebergLite.snapshotFilesDistributed(spark, root, 1L)
    val distSec = (System.nanoTime() - t1) / 1e9
    assert(distAll.size === n)
    assert(distAll.map(_._1).toSet == files.toSet)
    // the scale path: stats-pruned distributed scan — the driver
    // receives 10 survivors of 100k, never the full entry list
    val t2 = System.nanoTime()
    val kept = IcebergLite.snapshotFilesDistributed(spark, root, 1L,
      Seq(DeltaLog.ColRange("k", Some(10), Some(19))))
    val pruneSec = (System.nanoTime() - t2) / 1e9
    assert(kept.size === 10, s"expected 10 survivors, got ${kept.size}")
    assert(bytesPerFile < 5000.0,
      f"per-entry driver footprint implausible: $bytesPerFile%.0f B/file")
    info(f"n=$n replay=$replaySec%.1fs distAll=$distSec%.1fs " +
      f"prune=$pruneSec%.1fs ~$bytesPerFile%.0f B/file")
    // Committed-artifact refresh is explicit (the DeltaLogSpec
    // rationale: plain `sbt test` must not rewrite committed evidence
    // that SurveyIntegritySpec pins the prose against).
    val refresh = sys.env.get("SPARK_GRAFT_REFRESH_EVIDENCE").contains("1")
    val dest =
      if (refresh) java.nio.file.Paths.get("ICEBERG_METADATA_r13.json")
      else {
        val d = java.nio.file.Paths.get("target", "evidence")
        java.nio.file.Files.createDirectories(d)
        d.resolve("ICEBERG_METADATA_r13.json")
      }
    java.nio.file.Files.write(
      dest,
      (f"""{"metric":"iceberg_metadata_ceiling","n_files":$n,""" +
        f""""n_manifests":${n / perManifest},""" +
        f""""driver_replay_sec":$replaySec%.2f,""" +
        f""""distributed_scan_sec":$distSec%.2f,""" +
        f""""distributed_prune_sec":$pruneSec%.2f,""" +
        f""""prune_survivors":10,""" +
        f""""measured_bytes_per_entry":$bytesPerFile%.0f,""" +
        f""""note":"driver-serial replay materializes one entry per live file (the measured ceiling); snapshotFilesDistributed plans as one Spark job over the manifest avros and the driver receives survivors only - the Iceberg twin of Delta's checkpoint prune, sharing DeltaLog.fileAdmits"}%n""")
        .getBytes("UTF-8"))
  }
}
