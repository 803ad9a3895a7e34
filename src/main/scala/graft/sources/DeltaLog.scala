package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import scala.jdk.CollectionConverters._

/** Delta-Lake-format transaction log, implemented at the FORMAT level
  * (the log is plain JSON lines + parquet — no delta jars involved).
  *
  * Layout under `root/` (the open `_delta_log` convention):
  *   _delta_log/00000000000000000000.json   commit 0 (one JSON action
  *                                          per line: protocol,
  *                                          metaData, add, remove, ...)
  *   _delta_log/<v>.checkpoint.parquet      optional compacted state
  *   _delta_log/_last_checkpoint            pointer to the checkpoint
  *   <data files>.parquet                   immutable, referenced by
  *                                          add actions (relative paths)
  *
  * Semantics implemented from the published protocol:
  *  - a table version = the cumulative replay of commits 0..N; `add`
  *    puts a file into the active set, `remove` takes it out, the
  *    latest `metaData` wins (schemaString = Spark StructType JSON,
  *    which Delta uses verbatim), unknown actions/fields (commitInfo,
  *    txn, stats, tags) are tolerated and ignored — that tolerance is
  *    what makes logs written by OTHER writers readable here.
  *  - commit N is published by atomically renaming a temp file to
  *    `<20-digit N>.json`; readers list the dir, so a half-written
  *    commit is never visible. (A multi-writer deployment would use
  *    the store's put-if-absent on that name — same publish point.)
  *  - a checkpoint at version N compacts replay state (active adds +
  *    latest metaData/protocol) into one parquet file so readers do
  *    O(commits since checkpoint) JSON work, not O(all commits) —
  *    the property that keeps a 10-year-old 100 TB table's planning
  *    cost flat.
  *
  * Scale shape: the log is METADATA — driver-side lists of file names
  * (like every manifest in this repo: TimeTravel, Zorder, Iceberg).
  * Data files never move on commit; an append writes only its own
  * files + one small JSON; time travel is choosing how far to replay.
  */
object DeltaLog {

  private val mapper = new ObjectMapper()

  /** Replayed table state as of one version. `files` are
    * table-root-relative data file paths (the active `add` set).
    */
  final case class Snapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[String])

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def logDir(root: String) = new Path(root, "_delta_log")

  private def commitName(v: Long): String = f"$v%020d.json"

  /** Highest committed version, -1 if the table does not exist. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val dir = logDir(root)
    if (!f.exists(dir)) -1L
    else
      f.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(n => n.endsWith(".json") &&
          n.stripSuffix(".json").nonEmpty &&
          n.stripSuffix(".json").forall(_.isDigit))
        .map(_.stripSuffix(".json").toLong)
        .reduceOption(_ max _).getOrElse(-1L)
  }

  // ---- replay (read side) -------------------------------------------

  /** Mutable replay state shared by the JSON and checkpoint paths. */
  private final class Replay {
    var schemaJson: String = _
    var partCols: Seq[String] = Nil
    // insertion-ordered so snapshots list files deterministically
    val active = scala.collection.mutable.LinkedHashSet[String]()
    def applyLine(line: String): Unit = {
      val node = mapper.readTree(line)
      if (node.has("metaData") && !node.get("metaData").isNull) {
        val m = node.get("metaData")
        schemaJson = m.get("schemaString").asText()
        partCols =
          if (m.has("partitionColumns"))
            m.get("partitionColumns").asInstanceOf[ArrayNode]
              .elements().asScala.map(_.asText()).toSeq
          else Nil
      }
      if (node.has("add") && !node.get("add").isNull)
        active += node.get("add").get("path").asText()
      if (node.has("remove") && !node.get("remove").isNull)
        active -= node.get("remove").get("path").asText()
      // protocol / commitInfo / txn / cdc / anything newer: ignored —
      // forward-compatible tolerance is part of the format contract
    }
  }

  private def readCommitLines(f: FileSystem, root: String, v: Long): Seq[String] = {
    val p = new Path(logDir(root), commitName(v))
    require(f.exists(p), s"missing Delta commit $p — log is not contiguous")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.trim.nonEmpty).toList
    finally in.close()
  }

  /** Replay the log up to and including `asOf`. With
    * `useCheckpoint = true` (default) and a `_last_checkpoint` at
    * version <= asOf, replay starts from the checkpoint parquet and
    * only the newer JSON commits are read.
    */
  def snapshotAsOf(spark: SparkSession, root: String, asOf: Long,
      useCheckpoint: Boolean = true): Snapshot = {
    val f = fs(spark, root)
    val r = new Replay
    val from: Long = {
      val cp = if (useCheckpoint) lastCheckpointVersion(spark, root) else None
      cp.filter(_ <= asOf) match {
        case Some(cv) => loadCheckpoint(spark, root, cv, r); cv + 1
        case None     => 0L
      }
    }
    for (v <- from to asOf) readCommitLines(f, root, v).foreach(r.applyLine)
    require(r.schemaJson != null,
      s"no metaData action found replaying $root up to v$asOf")
    Snapshot(asOf,
      DataType.fromJson(r.schemaJson).asInstanceOf[StructType],
      r.partCols, r.active.toSeq)
  }

  /** Time-travel read: the table exactly as of version `v`. The scan
    * is a plain multi-file parquet read with the snapshot's schema,
    * so pushdown/pruning behave as on an unversioned table.
    */
  def readVersion(spark: SparkSession, root: String, v: Long,
      useCheckpoint: Boolean = true): DataFrame = {
    val snap = snapshotAsOf(spark, root, v, useCheckpoint)
    if (snap.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], snap.schema)
    else {
      val paths = snap.files.map(rel => s"$root/$rel")
      val df = spark.read
        .schema(snap.schema)
        .option("basePath", root) // partition cols come from dir names
        .parquet(paths: _*)
      df.select(snap.schema.fieldNames.map(df.col).toIndexedSeq: _*)
    }
  }

  def readLatest(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(spark, root))

  // ---- commit (write side) ------------------------------------------

  private def writeAtomic(f: FileSystem, dest: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(dest.getParent, s".${dest.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    // the rename IS the publish point (put-if-absent in a multi-writer)
    require(f.rename(tmp, dest), s"commit rename to $dest failed")
  }

  private def protocolLine: String = {
    val n = mapper.createObjectNode()
    val p = n.putObject("protocol")
    p.put("minReaderVersion", 1); p.put("minWriterVersion", 2)
    mapper.writeValueAsString(n)
  }

  private def metaDataLine(schema: StructType, partitionBy: Seq[String]): String = {
    val n = mapper.createObjectNode()
    val m = n.putObject("metaData")
    m.put("id", java.util.UUID.randomUUID().toString)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    val pc = m.putArray("partitionColumns")
    partitionBy.foreach(pc.add)
    m.putObject("configuration")
    m.put("createdTime", System.currentTimeMillis())
    mapper.writeValueAsString(n)
  }

  /** Decode Spark/Hive %XX path escaping in partition values. A run of
    * consecutive %XX escapes is one UTF-8 byte SEQUENCE (e.g. é is
    * %C3%A9) — decoding each byte as its own char would record mojibake
    * in the add action's partitionValues for any non-ASCII value.
    */
  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length) {
        val bytes = new java.io.ByteArrayOutputStream()
        while (i + 3 <= s.length && s.charAt(i) == '%') {
          bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
          i += 3
        }
        b.append(new String(bytes.toByteArray, "UTF-8"))
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  private def addLine(rel: String, size: Long, ts: Long): String = {
    val n = mapper.createObjectNode()
    val a = n.putObject("add")
    a.put("path", rel)
    val pv = a.putObject("partitionValues")
    rel.split('/').dropRight(1).filter(_.contains('=')).foreach { seg =>
      val Array(k, v) = seg.split("=", 2)
      pv.put(k, unescape(v))
    }
    a.put("size", size)
    a.put("modificationTime", ts)
    a.put("dataChange", true)
    mapper.writeValueAsString(n)
  }

  private def removeLine(rel: String, ts: Long): String = {
    val n = mapper.createObjectNode()
    val r = n.putObject("remove")
    r.put("path", rel)
    r.put("deletionTimestamp", ts)
    r.put("dataChange", true)
    mapper.writeValueAsString(n)
  }

  /** Write df's parquet files into the table dir (via a hidden staging
    * dir + rename — data files appear with their final Spark part-file
    * names, which embed a job UUID, so names never collide across
    * commits). Returns (relativePath, size) per data file.
    */
  private def stageDataFiles(df: DataFrame, root: String,
      partitionBy: Seq[String]): Seq[(String, Long)] = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    // qualified so URI relativize below works against listFiles'
    // scheme-qualified paths
    val stage = f.makeQualified(new Path(root, s".stage-$tag"))
    val w = df.write.mode(SaveMode.ErrorIfExists)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(stage.toString)
    val moved = scala.collection.mutable.Buffer[(String, Long)]()
    val it = f.listFiles(stage, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) {
        val rel = stage.toUri.relativize(st.getPath.toUri).getPath
        require(!rel.startsWith("/"),
          s"could not relativize ${st.getPath} against $stage")
        val dest = new Path(root, rel)
        f.mkdirs(dest.getParent)
        require(f.rename(st.getPath, dest), s"stage move to $dest failed")
        moved += ((rel, st.getLen))
      }
    }
    f.delete(stage, true)
    moved.toSeq.sortBy(_._1)
  }

  private def commit(df: DataFrame, root: String, partitionBy: Seq[String],
      overwrite: Boolean): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val parent = currentVersion(spark, root)
    val v = parent + 1
    val ts = System.currentTimeMillis()
    val removed: Seq[String] =
      if (overwrite && parent >= 0)
        snapshotAsOf(spark, root, parent).files
      else Nil
    val files = stageDataFiles(df, root, partitionBy)
    val lines = scala.collection.mutable.Buffer[String]()
    if (v == 0L) {
      lines += protocolLine
      lines += metaDataLine(df.schema, partitionBy)
    }
    lines ++= removed.map(removeLine(_, ts))
    lines ++= files.map { case (rel, sz) => addLine(rel, sz, ts) }
    writeAtomic(f, new Path(logDir(root), commitName(v)),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    v
  }

  /** Append df as commit N+1 (new add actions only). */
  def commitAppend(df: DataFrame, root: String,
      partitionBy: Seq[String] = Nil): Long =
    commit(df, root, partitionBy, overwrite = false)

  /** Replace the table content with df: remove actions for every
    * currently-active file + add actions for the new ones. Old
    * versions keep reading their own files (nothing is deleted).
    */
  def commitOverwrite(df: DataFrame, root: String,
      partitionBy: Seq[String] = Nil): Long =
    commit(df, root, partitionBy, overwrite = true)

  // ---- checkpoint ----------------------------------------------------

  import org.apache.spark.sql.types._

  /** Delta checkpoint column layout (the nullable action structs the
    * published format uses; one action per row).
    */
  private val checkpointSchema = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType))))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType))))))

  /** Compact the state as of the CURRENT version into
    * `_delta_log/<v>.checkpoint.parquet` + `_last_checkpoint`.
    * Readers then replay only commits newer than v. Returns v.
    */
  def writeCheckpoint(spark: SparkSession, root: String): Long = {
    val v = currentVersion(spark, root)
    require(v >= 0, s"cannot checkpoint $root — no commits")
    val snap = snapshotAsOf(spark, root, v, useCheckpoint = false)
    val ts = System.currentTimeMillis()
    val rows: Seq[Row] =
      Row(Row(1, 2), null, null) +:
      Row(null,
        Row(java.util.UUID.randomUUID().toString, Row("parquet"),
          snap.schema.json, snap.partitionColumns), null) +:
      snap.files.map(rel => Row(null, null, Row(rel, 0L, ts, true)))
    val f = fs(spark, root)
    // parquet writers emit a directory; the checkpoint is one FILE —
    // write single-part to a temp dir and move the part file in
    val tmpDir = new Path(root, s".cp-${java.util.UUID.randomUUID().toString.take(8)}")
    spark.createDataFrame(rows.asJava, checkpointSchema)
      .repartition(1)
      .write.mode(SaveMode.ErrorIfExists).parquet(tmpDir.toString)
    val part = {
      val it = f.listFiles(tmpDir, false)
      var found: Path = null
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) found = st.getPath
      }
      require(found != null, "checkpoint write produced no parquet part")
      found
    }
    val dest = new Path(logDir(root), f"$v%020d.checkpoint.parquet")
    f.delete(dest, false)
    require(f.rename(part, dest), s"checkpoint move to $dest failed")
    f.delete(tmpDir, true)
    writeAtomic(f, new Path(logDir(root), "_last_checkpoint"),
      s"""{"version":$v,"size":${rows.size}}\n""".getBytes("UTF-8"))
    v
  }

  /** Version recorded in `_last_checkpoint`, if present. */
  def lastCheckpointVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new Path(logDir(root), "_last_checkpoint")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(mapper.readTree(txt).get("version").asLong())
    }
  }

  private def loadCheckpoint(spark: SparkSession, root: String, v: Long,
      r: Replay): Unit = {
    val p = new Path(logDir(root), f"$v%020d.checkpoint.parquet")
    // the checkpoint is bounded METADATA (one row per active file) —
    // collecting it driver-side is the same cost as listing a manifest
    spark.read.parquet(p.toString).collect().foreach { row =>
      val md = row.getAs[Row]("metaData")
      if (md != null) {
        r.schemaJson = md.getAs[String]("schemaString")
        r.partCols = md.getAs[scala.collection.Seq[String]]("partitionColumns").toSeq
      }
      val add = row.getAs[Row]("add")
      if (add != null) r.active += add.getAs[String]("path")
    }
  }
}
