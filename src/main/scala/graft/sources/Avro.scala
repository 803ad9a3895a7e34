package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
import scala.jdk.CollectionConverters._

/** Avro container-file source/sink over avro-core alone.
  *
  * This Spark build ships `avro-1.12.x` (the core serialization
  * library) but not the `spark-avro` datasource jar, so
  * `spark.read.format("avro")` is unavailable. The capability is
  * still implementable without it: an Avro container file is
  * self-describing (schema in the header) and splits naturally BY
  * FILE, so the bridge parallelizes the way a Kafka-archive ingest
  * actually arrives — many container files, one reader task per file.
  *
  * Scale shape: file discovery is driver-side METADATA (a name list,
  * like every file-source manifest); decode runs fully distributed,
  * one `DataFileReader` stream per task with O(row) state. Writes are
  * executor-local — one container file per partition, no driver
  * funnel.
  */
object Avro {

  /** Spark -> Avro schema for the flat primitive types the engine's
    * tables use. Every field is a `["null", T]` union so null cells
    * round-trip.
    */
  def avroSchema(schema: StructType, name: String): Schema = {
    def prim(dt: DataType): String = dt match {
      case LongType                        => "long"
      case IntegerType                     => "int"
      case DoubleType                      => "double"
      case FloatType                       => "float"
      case BooleanType                     => "boolean"
      case StringType                      => "string"
      case BinaryType                      => "bytes"
      case other =>
        throw new IllegalArgumentException(s"unsupported avro bridge type: $other")
    }
    val fields = schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null","${prim(f.dataType)}"]}"""
    }
    new Schema.Parser().parse(
      s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}""")
  }

  /** Writes one Avro container file per partition under `path`.
    * Executor-local streaming encode — rows never gather anywhere.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val json = avroSchema(schema, "row").toString
    val dir = new File(path)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
    } else dir.mkdirs()
    df.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val avro = new Schema.Parser().parse(json)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](avro))
          w.create(avro, new File(f"$path/part-$pid%05d.avro"))
          var n = 0L
          it.foreach { row =>
            val rec = new GenericData.Record(avro)
            var i = 0
            while (i < schema.length) {
              rec.put(i, row.get(i) match {
                case null       => null
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case v          => v
              })
              i += 1
            }
            w.append(rec)
            n += 1
          }
          w.close()
          Iterator(n)
        }
      }
      .count() // materialize the write job
    ()
  }

  /** Reads `path`'s container files into a DataFrame with `schema`
    * (names matched positionally against the Avro record fields).
    * One reader task per file — the natural Avro split unit.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = Option(new File(path).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".avro"))
      .map(_.getAbsolutePath)
      .sorted
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { file =>
        val r = new DataFileReader[GenericRecord](
          new File(file), new GenericDatumReader[GenericRecord]())
        val base = r.iterator().asScala
        // streaming decode with close-on-exhaustion — no per-file buffer
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) r.close()
            h
          }
          def next(): Row = {
            val rec = base.next()
            Row.fromSeq(Seq.tabulate(schema.length) { i =>
              rec.get(i) match {
                case null                         => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.get(a); a
                case v                            => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
