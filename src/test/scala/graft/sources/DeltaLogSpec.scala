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

  test("schema round-trips through schemaString") {
    val root = freshRoot("delta_schema")
    val o = Tables.orders(spark, sf).limit(10)
    DeltaLog.commitAppend(o, root)
    assert(DeltaLog.snapshotAsOf(spark, root, 0).schema === o.schema)
    assert(DeltaLog.readLatest(spark, root).schema === o.schema)
  }
}
