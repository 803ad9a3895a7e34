package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Iceberg-format table metadata at the FORMAT level: JSON table
  * metadata + avro manifest-list + avro manifest files over plain
  * parquet data — the published Iceberg table spec's file chain,
  * written and read with avro-core alone (no iceberg jars ship here).
  *
  * Layout under `root/` (the HadoopTables convention):
  *   data/s<N>/...parquet            immutable files of snapshot N
  *   metadata/v<N>.metadata.json     table metadata (schema as the
  *                                   spec's {"type":"struct", fields
  *                                   with ids} JSON; snapshot log;
  *                                   schemas array accumulates — each
  *                                   snapshot records its schema-id)
  *   metadata/snap-<id>.avro         manifest LIST: one record per
  *                                   manifest file in the snapshot
  *   metadata/manifest-<id>.avro     manifest: one record per data
  *                                   file (status + path + counts;
  *                                   status=2 DELETED records an
  *                                   overwrite's removed files)
  *   metadata/version-hint.text      pointer to the latest metadata
  *
  * The scale property is Iceberg's own: planning reads manifests
  * (metadata ∝ file count), never lists the data tree; an append
  * writes one new manifest and REUSES the parent's manifest files in
  * its manifest list, so commit cost is O(new files) regardless of
  * table size, and time travel = reading an older snapshot's list.
  * An overwrite writes a DELETE manifest (status=2 tombstones for the
  * replaced files — the history record) plus an ADD manifest, without
  * reusing parent manifests; older snapshots keep reading their own
  * lists untouched.
  *
  * All metadata IO goes through the Hadoop FileSystem API (manifests
  * are read fully into memory — bounded metadata, the same cost class
  * as every manifest list in this repo), so the chain works on any
  * Hadoop-addressable store, not just the local FS.
  */
object IcebergLite {

  private val mapper = new ObjectMapper()

  private val manifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"added_files_count","type":"int"},
      |{"name":"content","type":"int","default":0},
      |{"name":"sequence_number","type":"long","default":0}]}""".stripMargin)

  // stats_json is the LITE encoding of the spec's per-file bounds
  // (data_file.lower_bounds/upper_bounds/value_counts maps, field-id
  // keyed binary): the same data-skipping JSON DeltaLog.fileStats
  // writes ({numRecords, minValues, maxValues, nullCount}), so BOTH
  // formats prune through one shared predicate (DeltaLog.fileAdmits)
  // and the two prune layers can never diverge. Nullable with a null
  // default: pre-r13 manifests (and foreign ones) read as stats-less
  // entries, which the prune layer must ADMIT (skipping is an
  // optimization, never a correctness filter).
  private val manifestSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"},
      |{"name":"stats_json","type":["null","string"],"default":null}]}}]}""".stripMargin)

  // ---- Iceberg <-> Spark schema JSON --------------------------------

  private def icebergType(dt: DataType): String = dt match {
    case LongType       => "long"
    case IntegerType    => "int"
    case DoubleType     => "double"
    case FloatType      => "float"
    case BooleanType    => "boolean"
    case StringType     => "string"
    case BinaryType     => "binary"
    case DateType          => "date"
    // the spec: "timestamp" = without zone, "timestamptz" = UTC-adjusted
    case TimestampNTZType  => "timestamp"
    case TimestampType     => "timestamptz"
    case d: DecimalType    => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"iceberg bridge: unsupported type $other")
  }

  private def sparkType(t: String): DataType = t match {
    case "long"      => LongType
    case "int"       => IntegerType
    case "double"    => DoubleType
    case "float"     => FloatType
    case "boolean"   => BooleanType
    case "string"    => StringType
    case "binary"    => BinaryType
    case "date"        => DateType
    case "timestamp"   => TimestampNTZType
    case "timestamptz" => TimestampType
    case d if d.startsWith("decimal(") =>
      val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")").split(",")
      DecimalType(p.trim.toInt, s.trim.toInt)
    case other => throw new IllegalArgumentException(
      s"iceberg bridge: unsupported type $other")
  }

  /** The spec's schema JSON: struct fields carry ids + required. */
  private def schemaJson(schema: StructType, schemaId: Int): com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "struct"); n.put("schema-id", schemaId)
    val fields = n.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fields.addObject()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.put("type", icebergType(f.dataType))
    }
    n
  }

  private def parseSchema(node: com.fasterxml.jackson.databind.JsonNode): StructType =
    StructType(node.get("fields").elements().asScala.map { f =>
      StructField(f.get("name").asText(), sparkType(f.get("type").asText()),
        nullable = !f.get("required").asBoolean())
    }.toSeq)

  // ---- Hadoop-FS metadata IO (driver-side, bounded) ------------------

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def readBytes(f: FileSystem, p: Path): Array[Byte] = {
    val in = f.open(p)
    try in.readAllBytes() finally in.close()
  }

  /** tmp-write + ATOMIC overwriting rename (FileContext with
    * Rename.OVERWRITE — DeltaLog.publishOverwrite's primitive). The
    * previous delete-then-rename left a window where a reader saw no
    * file at all: for version-hint.text that meant currentMetaVersion
    * briefly returned -1 and readLatest failed. The tmp name carries a
    * uuid so concurrent writers never clobber each other's staging.
    */
  private def writeBytes(f: FileSystem, p: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, f.getConf)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def writeAvro(f: FileSystem, path: Path, schema: Schema,
      recs: Seq[GenericRecord]): Long = {
    val buf = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, buf)
    try recs.foreach(w.append) finally w.close()
    val bytes = buf.toByteArray
    writeBytes(f, path, bytes)
    bytes.length.toLong
  }

  private def readAvro(f: FileSystem, path: Path): Seq[GenericRecord] = {
    val in = new SeekableByteArrayInput(readBytes(f, path))
    val r = new DataFileReader[GenericRecord](
      in, new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  // ---- table state ---------------------------------------------------

  private def metaDir(root: String) = new Path(root, "metadata")

  /** Latest metadata version: read version-hint.text, then PROBE
    * upward while v{n+1}.metadata.json exists — the HadoopTables
    * convention, where the hint is advisory (a concurrent committer
    * may have published a newer metadata file whose hint flip hasn't
    * landed, or the hint write may have been lost entirely). -1 if the
    * table has no metadata at all.
    */
  def currentMetaVersion(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val hint = new Path(metaDir(root), "version-hint.text")
    var v =
      if (!f.exists(hint)) -1
      else new String(readBytes(f, hint), "UTF-8").trim.toInt
    while (f.exists(new Path(metaDir(root), s"v${v + 1}.metadata.json"))) v += 1
    v
  }

  private def readMeta(spark: SparkSession, root: String, v: Int) =
    mapper.readTree(new String(readBytes(fs(spark, root),
      new Path(metaDir(root), s"v$v.metadata.json")), "UTF-8"))

  private final case class ManifestRef(path: String, length: Long, added: Int,
      content: Int = 0, seq: Long = 0L)

  /** Field lookup tolerant of FOREIGN avro layouts: GenericData.Record
    * .get(name) THROWS on a field absent from the writer schema (it
    * does not return null), so optional-field defaults must check the
    * record's own schema first.
    */
  private def optField(r: GenericRecord, name: String): Option[AnyRef] =
    Option(r.getSchema.getField(name)).flatMap(_ => Option(r.get(name)))

  private def listManifests(spark: SparkSession, root: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long): Seq[ManifestRef] = {
    val snap = meta.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not in $root's snapshot log"))
    readAvro(fs(spark, root), new Path(root, snap.get("manifest-list").asText()))
      .map { r =>
        ManifestRef(r.get("manifest_path").toString,
          r.get("manifest_length").asInstanceOf[Long],
          r.get("added_files_count").asInstanceOf[Int],
          // pre-MOR manifest lists lack the field: data manifests
          optField(r, "content").map(_.asInstanceOf[Int]).getOrElse(0),
          // pre-equality-delete lists lack sequence_number: 0 (oldest)
          optField(r, "sequence_number").map(_.asInstanceOf[Long])
            .getOrElse(0L))
      }
  }

  private def manifestRecord(status: Int, relPath: String, size: Long,
      stats: Option[String] = None): GenericRecord = {
    val e = new GenericData.Record(manifestSchema)
    e.put("status", status)
    val d = new GenericData.Record(manifestSchema.getField("data_file").schema())
    d.put("file_path", relPath)
    d.put("file_format", "PARQUET")
    d.put("record_count",
      stats.flatMap(s => scala.util.Try(
        mapper.readTree(s).get("numRecords").asLong()).toOption)
        .getOrElse(-1L))
    d.put("file_size_in_bytes", size)
    stats.foreach(s => d.put("stats_json", s))
    e.put("data_file", d)
    e
  }

  /** Shared commit machinery. `reuseParentManifests` is the append
    * path (commit cost ∝ new files); the overwrite path instead writes
    * a status=2 DELETE manifest for the parent's live files and does
    * NOT carry parent manifests forward.
    */
  /** OPTIMISTIC-CONCURRENCY commit (the DeltaLog.commit shape; closes
    * the r8 verdict's last-writer-wins finding). Data files are
    * written ONCE to a writer-unique dir (never collide); the
    * metadata loop then: reads the current version, builds metadata
    * v=N+1 against that parent, and publishes v{N+1}.metadata.json
    * with the put-if-absent primitive (DeltaLog.publishNew — hard
    * link on local FS, atomic-fail-if-exists rename on HDFS-likes).
    * The METADATA FILE is the commit point — real HadoopTables
    * semantics; losing the race re-reads the winner's metadata as the
    * new parent and retries, so an overwrite recomputes its DELETE
    * manifest from the files live at ITS commit point. The hint flip
    * after the win is advisory (currentMetaVersion probes past it).
    * Manifest/list names carry the writer tag: two racers building
    * the same version must never reference each other's bytes.
    */
  private def commit(df: DataFrame, root: String, overwrite: Boolean,
      readVersion: Option[Long] = None, content: Int = 0): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    f.mkdirs(metaDir(root))
    val tag = java.util.UUID.randomUUID().toString.take(8)

    val dataDir = s"data/s-$tag"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dataDir")
    val dataFiles = f.listStatus(new Path(root, dataDir)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    // per-file skipping stats from parquet FOOTERS (shared with the
    // Delta writer: driver below 16 files, one Spark job past it, so
    // commit wall-clock stays O(new files / cores)); a failed read
    // degrades that file to a stats-less entry, never aborts
    val statsByRel: Map[String, Option[String]] = DeltaLog.collectStats(
      spark, root, dataFiles.map(st => s"$dataDir/${st.getPath.getName}"),
      df.schema)

    // the metadata version this transaction's snapshot was read at
    // (explicit from the caller, else the version current at entry) —
    // the baseline for the write-write conflict check below
    val startParent: Long =
      readVersion.getOrElse(currentMetaVersion(spark, root).toLong)
    var attempt = 0
    while (true) {
      val parentV = currentMetaVersion(spark, root)
      // WRITE-WRITE CONFLICT CHECK (Iceberg's validation rule,
      // minimal form): any snapshot committed since this
      // transaction's baseline whose operation REPLACED files
      // ("overwrite" — it tombstoned the live set) invalidates the
      // snapshot this commit assumed; blindly committing on top
      // would interleave with superseded state. Snapshots are
      // identified by sequence-number (= meta version + 1), so the
      // ones to inspect are those with sequence > startParent + 1.
      // Pure appends commute and never conflict.
      if (parentV > startParent) {
        val pm = readMeta(spark, root, parentV)
        val conflicting = pm.get("snapshots").elements().asScala
          .filter(s => s.get("sequence-number").asLong() > startParent + 1L)
          .filter(_.get("operation").asText() == "overwrite")
          .toSeq
        if (conflicting.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"commit to $root built on metadata v$startParent conflicts " +
              s"with ${conflicting.size} concurrent overwrite snapshot(s) " +
              s"(first: ${conflicting.head.get("snapshot-id").asLong()}) — " +
              "re-read the table and retry")
      }
      val v = parentV + 1
      val snapId = v + 1L // deterministic, monotone

      // one ADDED manifest for this snapshot's files
      val manifestName = s"manifest-$snapId-$tag.avro"
      val manifestLen = writeAvro(f, new Path(metaDir(root), manifestName),
        manifestSchema,
        dataFiles.map { st =>
          val rel = s"$dataDir/${st.getPath.getName}"
          manifestRecord(1, rel, st.getLen, statsByRel.getOrElse(rel, None))
        })

      val parentMeta =
        if (parentV < 0) None else Some(readMeta(spark, root, parentV))

      // manifest list: append REUSES parent manifests; overwrite
      // replaces them with one status=2 DELETE manifest recording the
      // removal — recomputed per attempt from the CURRENT parent
      val carried: Seq[ManifestRef] = parentMeta match {
        case None => Nil
        case Some(pm) =>
          val parentSnap = pm.get("current-snapshot-id").asLong()
          if (!overwrite) listManifests(spark, root, pm, parentSnap)
          else {
            val live = snapshotFilesOf(spark, root, pm, parentSnap)
            val delName = s"manifest-$snapId-$tag-deletes.avro"
            val delLen = writeAvro(f, new Path(metaDir(root), delName),
              manifestSchema,
              live.map { case (p, sz) => manifestRecord(2, p, sz) })
            Seq(ManifestRef(s"metadata/$delName", delLen, 0, seq = v + 1L))
          }
      }
      val listName = s"snap-$snapId-$tag.avro"
      // data sequence number: carried manifests keep the sequence they
      // were COMMITTED at (the spec's inherited sequence); the new
      // manifest gets this snapshot's — the ordering equality deletes
      // apply by (a delete at sequence S drops only rows of data
      // manifests with sequence < S)
      val entries = carried :+
        ManifestRef(s"metadata/$manifestName", manifestLen, dataFiles.length,
          content, seq = v + 1L)
      writeAvro(f, new Path(metaDir(root), listName), manifestListSchema,
        entries.map { m =>
          val r = new GenericData.Record(manifestListSchema)
          r.put("manifest_path", m.path); r.put("manifest_length", m.length)
          r.put("added_files_count", m.added); r.put("content", m.content)
          r.put("sequence_number", m.seq); r
        })

      // schemas accumulate: reuse the id of an equal prior schema,
      // else append with the next id — each snapshot records ITS
      // schema-id, so time travel across a schema change reads each
      // snapshot with the schema it was written under. The comparison
      // canonicalizes df.schema through the same JSON round-trip the
      // priors took (drops StructField metadata and non-roundtripping
      // detail) — raw StructType equality re-registered an identical
      // schema on every commit whenever the df carried field metadata.
      val canonSchema =
        if (content >= 1) // delete commits keep the TABLE schema: the
          // delete file's own schema (file_path/pos, or the equality
          // key projection) is not a table schema change
          parentMeta.map { pm =>
            val cur = pm.get("current-schema-id").asInt()
            parseSchema(pm.get("schemas").elements().asScala.toSeq
              .find(_.get("schema-id").asInt() == cur).get)
          }.getOrElse(throw new IllegalStateException(
            s"delete commit to $root requires an existing table"))
        else parseSchema(schemaJson(df.schema, -1))
      val priorSchemas: Seq[(Int, StructType, com.fasterxml.jackson.databind.JsonNode)] =
        parentMeta.map(_.get("schemas").elements().asScala.toSeq.map { s =>
          (s.get("schema-id").asInt(), parseSchema(s), s)
        }).getOrElse(Nil)
      val (schemaId, schemasOut) =
        priorSchemas.find(_._2 == canonSchema) match {
          case Some((id, _, _)) => (id, priorSchemas.map(_._3))
          case None =>
            val id = priorSchemas.map(_._1).maxOption.getOrElse(-1) + 1
            (id, priorSchemas.map(_._3) :+
              (schemaJson(df.schema, id): com.fasterxml.jackson.databind.JsonNode))
        }

      // metadata json: snapshot log accumulates, current flips
      val meta = mapper.createObjectNode()
      meta.put("format-version", 2)
      meta.put("table-uuid", java.util.UUID.nameUUIDFromBytes(
        root.getBytes("UTF-8")).toString)
      meta.put("location", root)
      meta.put("current-schema-id", schemaId)
      val schemasArr = meta.putArray("schemas")
      schemasOut.foreach(schemasArr.add)
      meta.put("current-snapshot-id", snapId)
      val snaps = meta.putArray("snapshots")
      parentMeta.foreach(_.get("snapshots").elements().asScala
        .foreach(s => snaps.add(s)))
      val sn = snaps.addObject()
      sn.put("snapshot-id", snapId)
      sn.put("sequence-number", v + 1L)
      sn.put("timestamp-ms", System.currentTimeMillis())
      sn.put("manifest-list", s"metadata/$listName")
      sn.put("schema-id", schemaId)
      sn.put("operation",
        if (overwrite) "overwrite" else if (content >= 1) "delete" else "append")

      // COMMIT POINT: put-if-absent on the metadata file
      if (DeltaLog.publishNew(spark,
        new Path(metaDir(root), s"v$v.metadata.json"),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))) {
        // advisory for readers that trust the hint; probing covers a
        // lost/stale flip
        writeBytes(f, new Path(metaDir(root), "version-hint.text"),
          s"$v".getBytes("UTF-8"))
        return snapId
      }
      attempt += 1
      require(attempt < 50,
        s"iceberg commit to $root lost $attempt publish races — giving up")
    }
    -1L // unreachable
  }

  /** Append df as a new snapshot; returns the new snapshot id.
    * Commit = data files + ONE new manifest + a manifest list that
    * reuses the parent's manifests + one metadata JSON + hint flip.
    * `readVersion`, when given, is the metadata version the caller
    * read before writing; the commit then ABORTS
    * (ConcurrentModificationException) if an overwrite snapshot
    * landed since — the table the append assumed no longer exists.
    * Without it, appends are blind and only in-flight races are
    * validated.
    */
  def commitAppend(df: DataFrame, root: String,
      readVersion: Option[Long] = None): Long =
    commit(df, root, overwrite = false, readVersion)

  /** Replace the table content with df. The new snapshot's manifest
    * list = one status=2 DELETE manifest tombstoning every file live
    * in the parent + one ADDED manifest for df's files. Nothing is
    * physically deleted: older snapshots' manifest lists are untouched
    * and keep time-traveling to the replaced data. Conflict rule:
    * intermediate appends are superseded serializably (the DELETE
    * manifest is recomputed from the fresh parent each attempt); an
    * intermediate overwrite aborts.
    */
  def commitOverwrite(df: DataFrame, root: String,
      readVersion: Option[Long] = None): Long =
    commit(df, root, overwrite = true, readVersion)

  /** (path, size) of a snapshot's live files via its manifest chain. */
  private def snapshotFilesOf(spark: SparkSession, root: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long): Seq[(String, Long)] = {
    val f = fs(spark, root)
    listManifests(spark, root, meta, snapshotId)
      .filter(_.content == 0).flatMap { m =>
      readAvro(f, new Path(root, m.path))
        .filter(_.get("status").asInstanceOf[Int] != 2) // DELETED
        .map { e =>
          val d = e.get("data_file").asInstanceOf[GenericRecord]
          (d.get("file_path").toString,
            d.get("file_size_in_bytes").asInstanceOf[Long])
        }
    }
  }

  /** (path, data sequence number) of a snapshot's live files — the
    * per-file ordering equality deletes apply by.
    */
  private def snapshotFileSeqsOf(spark: SparkSession, root: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long): Seq[(String, Long)] = {
    val f = fs(spark, root)
    listManifests(spark, root, meta, snapshotId)
      .filter(_.content == 0).flatMap { m =>
        readAvro(f, new Path(root, m.path))
          .filter(_.get("status").asInstanceOf[Int] != 2)
          .map(e => (e.get("data_file").asInstanceOf[GenericRecord]
            .get("file_path").toString, m.seq))
      }
  }

  /** Data file paths (root-relative) of a snapshot, via its manifest
    * list -> manifest chain. Excludes DELETED (status=2) entries.
    */
  def snapshotFiles(spark: SparkSession, root: String,
      snapshotId: Long): Seq[String] =
    snapshotFilesOf(spark, root,
      readMeta(spark, root, currentMetaVersion(spark, root)), snapshotId)
      .map(_._1)


  // ---- v2 merge-on-read: position deletes ----------------------------

  /** Root-relative position-delete files of a snapshot (content=1
    * manifests). Each is a parquet of (file_path, pos) rows —
    * Iceberg's position-delete file shape.
    */
  private def snapshotDeleteFilesOf(spark: SparkSession, root: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long): Seq[String] = {
    val f = fs(spark, root)
    listManifests(spark, root, meta, snapshotId)
      .filter(_.content == 1).flatMap { m =>
        readAvro(f, new Path(root, m.path))
          .filter(_.get("status").asInstanceOf[Int] != 2)
          .map(_.get("data_file").asInstanceOf[GenericRecord]
            .get("file_path").toString)
      }
  }

  /** The root-relative key of a scanned data file ("data/s-tag/part-
    * ....parquet") extracted from the absolute _metadata.file_path —
    * what position-delete vectors key on.
    */
  private def relFileKey(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.regexp_extract(
      c, "(data/s-[^/]+/[^/]+)$", 1)

  /** MERGE-ON-READ row deletion (Iceberg v2 position deletes): mark
    * the CURRENT snapshot's rows matching `cond` as deleted by
    * writing a position-delete file — (data file, row position)
    * pairs, derived from the parquet scan's _metadata columns — and
    * committing it under a content=1 manifest. No data file is
    * rewritten (copy-on-write would rewrite every touched file);
    * readers apply the vector as an anti-join. Returns the new
    * snapshot id.
    *
    * Scale shape: the delete write costs one predicate scan plus a
    * file proportional to MATCHED rows; the per-read apply cost is a
    * broadcast anti-join of the (small) delete vectors against the
    * scan — the read-amplification-for-write-cheapness trade v2 MOR
    * is. Compaction (rewriting files to fold vectors in) is the
    * existing sink_compact shape, composable later.
    */
  def commitPositionDeletes(spark: SparkSession, root: String,
      cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.col
    // capture the metadata version the positions are derived AGAINST
    // and pass it as the commit's read baseline: a concurrent
    // overwrite landing between this scan and commit() must abort
    // (ConcurrentModificationException) — otherwise the content=1
    // manifest would commit (file_path, pos) rows referencing
    // replaced data files and the requested rows would stay live
    commitPositionDeletesAt(spark, root, cond,
      currentMetaVersion(spark, root))
  }

  /** [[commitPositionDeletes]] with the read baseline made explicit
    * (package-visible so the overwrite-conflict contract is testable
    * deterministically): positions are derived against the snapshot
    * current at metadata `readV`, and the commit aborts if an
    * overwrite snapshot landed after `readV`.
    */
  private[graft] def commitPositionDeletesAt(spark: SparkSession,
      root: String, cond: org.apache.spark.sql.Column, readV: Int): Long = {
    import org.apache.spark.sql.functions.col
    val meta = readMeta(spark, root, readV)
    val snapId = meta.get("current-snapshot-id").asLong()
    val dels = readSnapshotRaw(spark, root, snapId)
      .withColumn("__fp", relFileKey(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
      .filter(cond)
      .select(col("__fp").as("file_path"), col("__pos").as("pos"))
    commit(dels, root, overwrite = false, readVersion = Some(readV.toLong),
      content = 1)
  }

  // ---- v2 merge-on-read: equality deletes ----------------------------

  /** Root-relative (delete file, sequence) of a snapshot's EQUALITY
    * delete files (content=2 manifests). Each file is a parquet whose
    * COLUMNS are the equality key set (the lite encoding of the
    * spec's equality_ids: the key set rides in the delete file's own
    * schema) and whose rows are the key values to drop.
    */
  private def snapshotEqDeletesOf(spark: SparkSession, root: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long): Seq[(String, Long)] = {
    val f = fs(spark, root)
    listManifests(spark, root, meta, snapshotId)
      .filter(_.content == 2).flatMap { m =>
        readAvro(f, new Path(root, m.path))
          .filter(_.get("status").asInstanceOf[Int] != 2)
          .map(e => (e.get("data_file").asInstanceOf[GenericRecord]
            .get("file_path").toString, m.seq))
      }
  }

  /** MERGE-ON-READ row deletion by KEY (Iceberg v2 equality deletes):
    * drop every row whose equality-key columns match a row of `keys`
    * (a frame whose columns ARE the key set, e.g. the ids of records
    * to retract) — committed as a parquet of key rows under a
    * content=2 manifest. No table scan happens at commit time (the
    * position-delete twin pays one predicate scan to resolve
    * positions; this path is what CDC retractions use when the writer
    * knows keys but not positions). Readers apply it as a null-safe
    * anti-join restricted BY SEQUENCE: a delete at sequence S drops
    * only rows of data files committed at sequence < S, so rows
    * re-inserted AFTER the retraction survive — the spec's ordering
    * rule, and the reason the manifest list carries sequence_number.
    * Validation matches the position-delete path: an overwrite landing
    * between the caller's read and this commit aborts (the new data
    * files would be at a LOWER sequence than this delete and its keys
    * would wrongly apply to them).
    */
  def commitEqualityDeletes(spark: SparkSession, root: String,
      keys: DataFrame): Long = {
    val readV = currentMetaVersion(spark, root)
    require(readV >= 0,
      s"equality-delete commit to $root requires an existing table")
    commit(keys, root, overwrite = false,
      readVersion = Some(readV.toLong), content = 2)
  }

  /** The snapshot's data files as a plain scan (no delete vectors
    * applied) — the base both the MOR read and the delete derivation
    * share. Callers may select _metadata columns from it.
    */
  private def readSnapshotRaw(spark: SparkSession, root: String,
      snapshotId: Long): DataFrame = {
    val meta = readMeta(spark, root, currentMetaVersion(spark, root))
    val snap = meta.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not in $root's snapshot log"))
    val schemaId =
      if (snap.has("schema-id")) snap.get("schema-id").asInt()
      else meta.get("current-schema-id").asInt()
    val schemaNode = meta.get("schemas").elements().asScala.toSeq
      .find(_.get("schema-id").asInt() == schemaId)
      .getOrElse(throw new IllegalStateException(
        s"schema-id $schemaId of snapshot $snapshotId missing from " +
          s"the schemas array — metadata is corrupt"))
    val schema = parseSchema(schemaNode)
    val files = snapshotFiles(spark, root, snapshotId).map(p => s"$root/$p")
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** Read the table as of `snapshotId` (time travel), using the SCHEMA
    * THAT SNAPSHOT WAS WRITTEN UNDER (its schema-id into the schemas
    * array) — a schema change between commits must not misread older
    * snapshots. Snapshots from writers that recorded no schema-id fall
    * back to the current schema.
    */
  def readSnapshot(spark: SparkSession, root: String,
      snapshotId: Long): DataFrame = {
    val meta = readMeta(spark, root, currentMetaVersion(spark, root))
    val snap = meta.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not in $root's snapshot log"))
    val schemaId =
      if (snap.has("schema-id")) snap.get("schema-id").asInt()
      else meta.get("current-schema-id").asInt()
    val schemaNode = meta.get("schemas").elements().asScala.toSeq
      .find(_.get("schema-id").asInt() == schemaId)
      .getOrElse(throw new IllegalStateException(
        s"schema-id $schemaId of snapshot $snapshotId missing from " +
          s"the schemas array — metadata is corrupt"))
    val schema = parseSchema(schemaNode)
    val files = snapshotFiles(spark, root, snapshotId).map(p => s"$root/$p")
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val base = spark.read.schema(schema).parquet(files: _*)
    applyMor(spark, root, meta, snapshotId, base)
  }

  /** Apply a snapshot's merge-on-read delete vectors (position +
    * equality) to `base` — shared by [[readSnapshot]] (full file set)
    * and [[readSnapshotPruned]] (survivors of the distributed prune;
    * a pruned-away file's vector has nothing to delete from the scan).
    */
  private def applyMor(spark: SparkSession, root: String,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long, base: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val delFiles = snapshotDeleteFilesOf(spark, root, meta, snapshotId)
    val eqDels = snapshotEqDeletesOf(spark, root, meta, snapshotId)
    if (delFiles.isEmpty && eqDels.isEmpty) return base
    var keyed = base
      .withColumn("__fp", relFileKey(col("_metadata.file_path")))
    if (delFiles.nonEmpty) {
      // v2 merge-on-read position deletes: drop rows whose (file,
      // position) appears in a delete vector — broadcast anti-join
      // (vectors are the small side by construction)
      val dels = spark.read.parquet(delFiles.map(p => s"$root/$p"): _*)
      keyed = keyed
        .withColumn("__pos", col("_metadata.row_index"))
      keyed = keyed.join(broadcast(dels),
          keyed("__fp") === dels("file_path") && keyed("__pos") === dels("pos"),
          "left_anti")
        .drop("__pos")
    }
    if (eqDels.nonEmpty) {
      // v2 equality deletes: each content=2 file (committed at
      // sequence S) drops matching-key rows of data files whose
      // sequence < S. File->sequence is bounded manifest metadata
      // (one row per live file), joined broadcast onto the scan key.
      // Same-key-schema delete files are CONSOLIDATED into one
      // anti-join (per-key MAX sequence) — without this the plan
      // grows one join per retraction commit until an overwrite
      // resets the table. Semantics-preserving because
      // "∃ delete with matching key at seq > row's seq" ⇔
      // "max delete seq over the key > row's seq".
      import spark.implicits._
      val fileSeq = broadcast(
        snapshotFileSeqsOf(spark, root, meta, snapshotId)
          .toDF("__fp", "__seq"))
      keyed = keyed.join(fileSeq, Seq("__fp"), "left")
      val bySchema = eqDels.groupBy { case (p, _) =>
        spark.read.parquet(s"$root/$p").schema.fields
          .map(f => (f.name, f.dataType)).toSeq
      }
      for ((_, files) <- bySchema.toSeq.sortBy(_._2.head._1)) {
        val union = files.map { case (p, seq) =>
          spark.read.parquet(s"$root/$p").withColumn("__dseq", lit(seq))
        }.reduce(_ unionByName _)
        val keyCols = union.columns.filterNot(_ == "__dseq")
        val dels = union.groupBy(keyCols.map(col): _*)
          .agg(org.apache.spark.sql.functions.max(col("__dseq")).as("__dseq"))
        val cond = keyCols.map(c => keyed(c) <=> dels(c)).reduce(_ && _) &&
          keyed("__seq") < dels("__dseq")
        keyed = keyed.join(broadcast(dels), cond, "left_anti")
      }
      keyed = keyed.drop("__seq")
    }
    keyed.drop("__fp")
  }

  // ---- distributed manifest scan (plan at file-count scale) ----------

  /** A snapshot's live (path, size) file set computed by ONE SPARK JOB
    * over its data manifests — the distributed twin of
    * [[snapshotFiles]] and the Iceberg analogue of
    * DeltaLog.prunedSnapshotViaCheckpoint. Driver-side work is the
    * manifest LIST alone (one avro record per manifest — bounded);
    * each task avro-decodes its manifests where they live, drops
    * tombstones (status=2), and applies the data-skipping predicate,
    * so the driver only ever receives SURVIVORS — never the O(files)
    * entry list the serial replay materializes. `ranges` prune through
    * DeltaLog.fileAdmits — the SAME predicate both Delta prune paths
    * share, evaluated against the stats_json bounds the Iceberg
    * writer captures from parquet footers; entries without stats are
    * admitted (skipping is never a correctness filter).
    *
    * IcebergLiteSpec pins distributed == driver replay (set equality,
    * ranges = Nil) and that a selective range hands the driver a
    * strict subset; tools/IcebergMetadata measures the ceiling on a
    * synthetic 100k-file chain (ICEBERG_METADATA_r13.json).
    */
  def snapshotFilesDistributed(spark: SparkSession, root: String,
      snapshotId: Long,
      ranges: Seq[DeltaLog.ColRange] = Nil): Seq[(String, Long)] = {
    val meta = readMeta(spark, root, currentMetaVersion(spark, root))
    val manifests = listManifests(spark, root, meta, snapshotId)
      .filter(_.content == 0).map(_.path)
    if (manifests.isEmpty) return Nil
    val snap = meta.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not in $root's snapshot log"))
    val schemaId =
      if (snap.has("schema-id")) snap.get("schema-id").asInt()
      else meta.get("current-schema-id").asInt()
    val types: Map[String, DataType] =
      meta.get("schemas").elements().asScala.toSeq
        .find(_.get("schema-id").asInt() == schemaId)
        .map(parseSchema).getOrElse(StructType(Nil))
        .fields.map(f => f.name -> f.dataType).toMap
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    // Hadoop Configuration is not serializable: ship entries, rebuild
    // per task (the DeltaLog.collectStats device — keeps store
    // credentials intact on real clusters)
    val confEntries = {
      val c = spark.sessionState.newHadoopConf()
      val b = Seq.newBuilder[(String, String)]
      val it = c.iterator()
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    spark.sparkContext
      .parallelize(manifests,
        math.min(manifests.size, spark.sparkContext.defaultParallelism))
      .flatMap { mPath =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        val p = new Path(root, mPath)
        readAvro(p.getFileSystem(c), p).iterator
          .filter(_.get("status").asInstanceOf[Int] != 2)
          .map { e =>
            val d = e.get("data_file").asInstanceOf[GenericRecord]
            (d.get("file_path").toString,
              d.get("file_size_in_bytes").asInstanceOf[Long],
              optField(d, "stats_json").map(_.toString))
          }
          .filter { case (fp, sz, st) =>
            DeltaLog.fileAdmits(
              DeltaLog.AddFile(fp, Map.empty, sz, 0L, st),
              ranges, types, Nil, tz)
          }
          .map(t => (t._1, t._2))
      }
      .collect().toSeq
  }

  /** Read `snapshotId` with file-grain data skipping: the distributed
    * manifest scan keeps only files whose stats ADMIT every range,
    * merge-on-read vectors of the kept files apply as usual, and the
    * ranges re-apply as a residual ROW filter (file-grain pruning is
    * necessary, not sufficient) — so the result equals
    * readSnapshot(...).filter(ranges) while opening a subset of its
    * files and never materializing the full file list on the driver.
    */
  def readSnapshotPruned(spark: SparkSession, root: String,
      snapshotId: Long, ranges: Seq[DeltaLog.ColRange]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val meta = readMeta(spark, root, currentMetaVersion(spark, root))
    val snap = meta.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not in $root's snapshot log"))
    val schemaId =
      if (snap.has("schema-id")) snap.get("schema-id").asInt()
      else meta.get("current-schema-id").asInt()
    val schema = parseSchema(
      meta.get("schemas").elements().asScala.toSeq
        .find(_.get("schema-id").asInt() == schemaId)
        .getOrElse(throw new IllegalStateException(
          s"schema-id $schemaId of snapshot $snapshotId missing")))
    val kept = snapshotFilesDistributed(spark, root, snapshotId, ranges)
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else applyMor(spark, root, meta, snapshotId,
        spark.read.schema(schema).parquet(kept.map(f => s"$root/${f._1}"): _*))
    ranges.filter(rg => types.contains(rg.column)).foldLeft(base) { (df, rg) =>
      val dt = types(rg.column)
      val lo = rg.lower.map(b => col(rg.column) >= lit(b.toString).cast(dt))
      val hi = rg.upper.map(b => col(rg.column) <= lit(b.toString).cast(dt))
      val nn = rg.isNull.map(want =>
        if (want) col(rg.column).isNull else col(rg.column).isNotNull)
      (lo.toSeq ++ hi.toSeq ++ nn.toSeq).foldLeft(df)(_.filter(_))
    }
  }

  def currentSnapshotId(spark: SparkSession, root: String): Long =
    readMeta(spark, root, currentMetaVersion(spark, root))
      .get("current-snapshot-id").asLong()

  def readLatest(spark: SparkSession, root: String): DataFrame =
    readSnapshot(spark, root, currentSnapshotId(spark, root))
}
