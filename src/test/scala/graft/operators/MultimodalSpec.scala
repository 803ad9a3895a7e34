package graft.operators

import graft.{SparkEntry, SparkSpec}

class MultimodalSpec extends SparkSpec {

  test("fake decode is deterministic and fixed-size") {
    val b = "hello media".getBytes("UTF-8")
    val f1 = Multimodal.fakeDecodeFeatures(b)
    val f2 = Multimodal.fakeDecodeFeatures(b.clone())
    assert(f1.length == 8 && f1.sameElements(f2))
    assert(f1(0) == b.length.toFloat)
    assert(Multimodal.fakeDecodeFeatures(Array.emptyByteArray).length == 8)
  }

  test("feature extraction is invariant to partitioning") {
    val base = SparkEntry.registry("mm_feature_extract").fn(spark, sf)
    val a = base.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val repart = graft.Tables.documents(spark, sf).repartition(13)
      .createOrReplaceTempView("ignored") // force nothing; partitioning is internal
    val b = SparkEntry.registry("mm_feature_extract").fn(spark, sf)
      .repartition(7).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y })
  }

  test("binary schema preserves byte length through the binary cast") {
    val rows = SparkEntry.registry("mm_binary_schema").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("n_bytes") > 0))
    assert(rows.forall(_.getAs[String]("media_format") == "text/plain"))
  }
}
