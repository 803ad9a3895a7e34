package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The avro-core container-file bridge (sources/Avro.scala): typed
  * round trips including nulls and binary, and the one-task-per-file
  * read parallelism that makes it a real distributed source.
  */
class AvroSpec extends SparkSpec {

  private def tmpDir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_avrospec_$name"

  test("supplier round-trips losslessly through avro container files") {
    val src = Tables.supplier(spark, sf)
    val out = tmpDir("supplier")
    Avro.write(src.repartition(3), out)
    val got = Avro.read(spark, out, src.schema)
    assert(got.count() === src.count())
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
  }

  test("null cells and binary columns survive the round trip") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("payload", BinaryType),
      StructField("score", DoubleType)))
    val rows = Seq(
      Row(1L, "a", Array[Byte](1, 2, 3), 0.5),
      Row(2L, null, null, null),
      Row(3L, "c", Array.emptyByteArray, -1.25))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = tmpDir("nulls")
    Avro.write(df, out)
    val got = Avro.read(spark, out, schema).orderBy("id").collect()
    assert(got.length === 3)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    assert(got(0).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 2, 3))
    assert(got(2).getAs[Array[Byte]]("payload").isEmpty)
    assert(got(2).getDouble(3) === -1.25)
  }

  test("reads parallelize one task per container file") {
    val out = tmpDir("parallel")
    Avro.write(Tables.nation(spark, sf).repartition(5), out)
    val files = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".avro"))
    assert(files > 1, "expected multiple container files")
    val got = Avro.read(spark, out, Tables.nation(spark, sf).schema)
    assert(got.rdd.getNumPartitions === files)
    assert(got.count() === Tables.nation(spark, sf).count())
  }

  test("src_avro registry row equals the source table") {
    val got = graft.SparkEntry.registry("src_avro").fn(spark, sf)
    val src = Tables.supplier(spark, sf).orderBy("s_suppkey")
    assert(got.collect().toSeq === src.collect().toSeq)
  }
}
