package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** A FOREIGN Iceberg metadata writer: hand-authors the
  * metadata.json -> manifest-list avro -> manifest avro chain the way
  * another engine would — avro record fields in a different order
  * than [[IcebergLite]]'s writer, extra fields a reader must ignore
  * (partition_spec_id, split_offsets, snapshot summaries, table
  * properties), non-sequential schema field ids, the OPTIONAL
  * content/sequence_number manifest-list columns absent entirely, and
  * no version-hint.text (readers must probe). Exists solely so
  * src_iceberg_foreign proves IcebergLite reads foreign layout
  * variance, not just its own bytes — the twin of the hand-written
  * log in src_delta_foreign.
  */
object IcebergForeign {

  // field order deliberately differs from IcebergLite.manifestListSchema;
  // content and sequence_number are absent (a v1-era writer)
  private val foreignListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"added_files_count","type":"int"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"manifest_path","type":"string"}]}""".stripMargin)

  // entry carries an extra snapshot_id; data_file is reordered and has
  // an extra split_offsets the reader must skip
  private val foreignManifestSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"file_format","type":"string"},
      |{"name":"file_path","type":"string"},
      |{"name":"file_size_in_bytes","type":"long"},
      |{"name":"split_offsets","type":["null",{"type":"array","items":"long"}],"default":null},
      |{"name":"record_count","type":"long"}]}},
      |{"name":"status","type":"int"}]}""".stripMargin)

  private def writeAvro(spark: SparkSession, path: Path, schema: Schema,
      recs: Seq[GenericRecord]): Long = {
    val f = path.getFileSystem(spark.sessionState.newHadoopConf())
    val buf = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, buf)
    try recs.foreach(w.append) finally w.close()
    val out = f.create(path, true)
    try out.write(buf.toByteArray) finally out.close()
    buf.size().toLong
  }

  private def writeText(spark: SparkSession, path: Path, text: String): Unit = {
    val f = path.getFileSystem(spark.sessionState.newHadoopConf())
    val out = f.create(path, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def entry(relPath: String, len: Long, snapId: Long): GenericRecord = {
    val e = new GenericData.Record(foreignManifestSchema)
    e.put("snapshot_id", snapId)
    e.put("status", 1)
    val d = new GenericData.Record(
      foreignManifestSchema.getField("data_file").schema())
    d.put("file_format", "PARQUET")
    d.put("file_path", relPath)
    d.put("file_size_in_bytes", len)
    d.put("split_offsets", null)
    d.put("record_count", 7L)
    e.put("data_file", d)
    e
  }

  private def listRec(path: String, len: Long, added: Int): GenericRecord = {
    val r = new GenericData.Record(foreignListSchema)
    r.put("added_files_count", added)
    r.put("partition_spec_id", 0)
    r.put("manifest_length", len)
    r.put("manifest_path", path)
    r
  }

  /** Write the two-snapshot foreign chain over data/a.parquet (len
    * `lenA`) and data/b.parquet (`lenB`): snapshot 101 = A, snapshot
    * 202 = A + B (the second manifest list re-references A's foreign
    * manifest, the append-reuse pattern). No version-hint.text.
    */
  def writeChain(spark: SparkSession, root: String,
      lenA: Long, lenB: Long): Unit = {
    val meta = new Path(root, "metadata")
    val mA = writeAvro(spark, new Path(meta, "m-aaaa.avro"),
      foreignManifestSchema, Seq(entry("data/a.parquet", lenA, 101L)))
    val mB = writeAvro(spark, new Path(meta, "m-bbbb.avro"),
      foreignManifestSchema, Seq(entry("data/b.parquet", lenB, 202L)))
    writeAvro(spark, new Path(meta, "snap-101.avro"), foreignListSchema,
      Seq(listRec("metadata/m-aaaa.avro", mA, 1)))
    writeAvro(spark, new Path(meta, "snap-202.avro"), foreignListSchema,
      Seq(listRec("metadata/m-aaaa.avro", mA, 0),
        listRec("metadata/m-bbbb.avro", mB, 1)))
    // foreign schema JSON: non-sequential field ids, schema-id 5
    val schemaJson =
      """{"type":"struct","schema-id":5,"fields":[
        |{"id":3,"name":"o_orderkey","required":false,"type":"long"},
        |{"id":9,"name":"o_orderstatus","required":false,"type":"string"}]}"""
        .stripMargin.replaceAll("\n", "")
    // snapshot 101 deliberately OMITS schema-id (the reader must fall
    // back to current-schema-id) and keys appear in a foreign order
    // with extra blocks (properties, partition-specs, summary)
    writeText(spark, new Path(meta, "v0.metadata.json"),
      s"""{
         |  "properties": {"owner": "someOtherEngine", "commit.retry.num-retries": "4"},
         |  "format-version": 2,
         |  "last-updated-ms": 1700000000000,
         |  "location": "$root",
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "table-uuid": "deadbeef-0000-0000-0000-000000000000",
         |  "schemas": [$schemaJson],
         |  "current-schema-id": 5,
         |  "current-snapshot-id": 101,
         |  "snapshots": [
         |    {"sequence-number": 1, "manifest-list": "metadata/snap-101.avro",
         |     "summary": {"operation": "append", "added-data-files": "1"},
         |     "snapshot-id": 101, "timestamp-ms": 1700000000000}
         |  ]
         |}""".stripMargin)
    writeText(spark, new Path(meta, "v1.metadata.json"),
      s"""{
         |  "format-version": 2,
         |  "location": "$root",
         |  "table-uuid": "deadbeef-0000-0000-0000-000000000000",
         |  "schemas": [$schemaJson],
         |  "current-schema-id": 5,
         |  "current-snapshot-id": 202,
         |  "snapshots": [
         |    {"sequence-number": 1, "manifest-list": "metadata/snap-101.avro",
         |     "summary": {"operation": "append"},
         |     "snapshot-id": 101, "timestamp-ms": 1700000000000},
         |    {"sequence-number": 2, "manifest-list": "metadata/snap-202.avro",
         |     "schema-id": 5, "operation": "append",
         |     "snapshot-id": 202, "timestamp-ms": 1700000000001}
         |  ]
         |}""".stripMargin)
  }
}
