package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
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
  *                                   with ids} JSON; snapshot log)
  *   metadata/snap-<id>.avro         manifest LIST: one record per
  *                                   manifest file in the snapshot
  *   metadata/manifest-<id>.avro     manifest: one record per data
  *                                   file (status + path + counts)
  *   metadata/version-hint.text      pointer to the latest metadata
  *
  * The scale property is Iceberg's own: planning reads manifests
  * (metadata ∝ file count), never lists the data tree; an append
  * writes one new manifest and REUSES the parent's manifest files in
  * its manifest list, so commit cost is O(new files) regardless of
  * table size, and time travel = reading an older snapshot's list.
  *
  * Like [[Avro]], metadata avro IO is driver-side `java.io.File`
  * streaming — manifests are small bounded metadata, the same cost
  * class as every manifest list in this repo.
  */
object IcebergLite {

  private val mapper = new ObjectMapper()

  private val manifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"added_files_count","type":"int"}]}""".stripMargin)

  private val manifestSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

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
  private def schemaJson(schema: StructType): com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "struct"); n.put("schema-id", 0)
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

  // ---- avro metadata IO (driver-side, bounded) -----------------------

  private def writeAvro(path: File, schema: Schema,
      recs: Seq[GenericRecord]): Long = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    try recs.foreach(w.append) finally w.close()
    path.length()
  }

  private def readAvro(path: File): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](
      path, new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  // ---- table state ---------------------------------------------------

  private def metaDir(root: String) = new File(root, "metadata")

  /** Latest metadata version per version-hint.text, -1 if none. */
  def currentMetaVersion(root: String): Int = {
    val hint = new File(metaDir(root), "version-hint.text")
    if (!hint.exists()) -1
    else {
      val src = scala.io.Source.fromFile(hint, "UTF-8")
      try src.mkString.trim.toInt finally src.close()
    }
  }

  private def readMeta(root: String, v: Int) = {
    val src = scala.io.Source.fromFile(
      new File(metaDir(root), s"v$v.metadata.json"), "UTF-8")
    try mapper.readTree(src.mkString) finally src.close()
  }

  /** Append df as a new snapshot; returns the new snapshot id.
    * Commit = data files + ONE new manifest + a manifest list that
    * reuses the parent's manifests + one metadata JSON + hint flip.
    */
  def commitAppend(df: DataFrame, root: String): Long = {
    val parentV = currentMetaVersion(root)
    val v = parentV + 1
    val snapId = v + 1L // deterministic, monotone
    metaDir(root).mkdirs()

    val dataDir = s"data/s$v"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dataDir")
    val dataFiles = Option(new File(root, dataDir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)

    // one manifest for this snapshot's added files
    val manifestName = s"manifest-$snapId.avro"
    writeAvro(new File(metaDir(root), manifestName), manifestSchema,
      dataFiles.toSeq.map { f =>
        val e = new GenericData.Record(manifestSchema)
        e.put("status", 1) // ADDED
        val d = new GenericData.Record(
          manifestSchema.getField("data_file").schema())
        d.put("file_path", s"$dataDir/${f.getName}")
        d.put("file_format", "PARQUET")
        d.put("record_count", -1L) // stats optional in this subset
        d.put("file_size_in_bytes", f.length())
        e.put("data_file", d)
        e
      })

    // manifest list = parent's manifests + the new one (reuse, no copy)
    val parentManifests: Seq[(String, Long, Int)] =
      if (parentV < 0) Nil
      else {
        val pm = readMeta(root, parentV)
        val listPath = pm.get("snapshots").elements().asScala.toSeq
          .find(_.get("snapshot-id").asLong() == pm.get("current-snapshot-id").asLong())
          .get.get("manifest-list").asText()
        readAvro(new File(root, listPath)).map { r =>
          (r.get("manifest_path").toString,
            r.get("manifest_length").asInstanceOf[Long],
            r.get("added_files_count").asInstanceOf[Int])
        }
      }
    val listName = s"snap-$snapId.avro"
    val entries = parentManifests :+
      ((s"metadata/$manifestName",
        new File(metaDir(root), manifestName).length(), dataFiles.length))
    writeAvro(new File(metaDir(root), listName), manifestListSchema,
      entries.map { case (p, len, n) =>
        val r = new GenericData.Record(manifestListSchema)
        r.put("manifest_path", p); r.put("manifest_length", len)
        r.put("added_files_count", n); r
      })

    // metadata json: snapshot log accumulates, current flips
    val meta = mapper.createObjectNode()
    meta.put("format-version", 2)
    meta.put("table-uuid", java.util.UUID.nameUUIDFromBytes(
      root.getBytes("UTF-8")).toString)
    meta.put("location", root)
    meta.put("current-schema-id", 0)
    meta.putArray("schemas").add(schemaJson(df.schema))
    meta.put("current-snapshot-id", snapId)
    val snaps = meta.putArray("snapshots")
    if (parentV >= 0)
      readMeta(root, parentV).get("snapshots").elements().asScala
        .foreach(s => snaps.add(s))
    val sn = snaps.addObject()
    sn.put("snapshot-id", snapId)
    sn.put("sequence-number", v + 1L)
    sn.put("timestamp-ms", System.currentTimeMillis())
    sn.put("manifest-list", s"metadata/$listName")

    val metaFile = new File(metaDir(root), s"v$v.metadata.json")
    val tmp = new File(metaDir(root), s".v$v.metadata.json.tmp")
    val out = new java.io.FileOutputStream(tmp)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(meta))
    finally out.close()
    require(tmp.renameTo(metaFile), s"metadata publish failed: $metaFile")
    // hint flip = the commit point for HadoopTables readers
    val hintTmp = new File(metaDir(root), ".version-hint.tmp")
    val ho = new java.io.FileOutputStream(hintTmp)
    try ho.write(s"$v".getBytes("UTF-8")) finally ho.close()
    hintTmp.renameTo(new File(metaDir(root), "version-hint.text"))
    snapId
  }

  /** Data file paths (root-relative) of a snapshot, via its manifest
    * list -> manifest chain. Excludes DELETED (status=2) entries.
    */
  def snapshotFiles(root: String, snapshotId: Long): Seq[String] = {
    val meta = readMeta(root, currentMetaVersion(root))
    val snap = meta.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not in $root's snapshot log"))
    val listPath = snap.get("manifest-list").asText()
    readAvro(new File(root, listPath)).flatMap { m =>
      readAvro(new File(root, m.get("manifest_path").toString))
        .filter(_.get("status").asInstanceOf[Int] != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString)
    }
  }

  /** Read the table as of `snapshotId` (time travel), with the schema
    * parsed back from the metadata JSON's Iceberg schema.
    */
  def readSnapshot(spark: SparkSession, root: String,
      snapshotId: Long): DataFrame = {
    val meta = readMeta(root, currentMetaVersion(root))
    val schema = parseSchema(
      meta.get("schemas").elements().asScala.next())
    val files = snapshotFiles(root, snapshotId).map(p => s"$root/$p")
    spark.read.schema(schema).parquet(files: _*)
  }

  def currentSnapshotId(root: String): Long =
    readMeta(root, currentMetaVersion(root))
      .get("current-snapshot-id").asLong()

  def readLatest(spark: SparkSession, root: String): DataFrame =
    readSnapshot(spark, root, currentSnapshotId(root))
}
