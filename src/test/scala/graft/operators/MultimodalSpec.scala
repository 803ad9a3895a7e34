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

  test("png encode -> imageio decode round-trips the pixel formula") {
    // the REAL decode: javax.imageio reads back exactly the pixels
    // the generative formula wrote (PNG is lossless)
    for (id <- Seq(0L, 7L, 123L)) {
      val (w, h, sr, sg, sb, mn, mx) =
        Multimodal.decodePngStats(Multimodal.encodePng(id))
      assert(w == (8 + id % 5).toInt && h == (8 + id % 7).toInt)
      val rs = for (x <- 0 until w; y <- 0 until h)
        yield ((id * 31 + x * 7 + y * 13) % 256).toInt
      assert(sr == rs.map(_.toLong).sum && mn == rs.min && mx == rs.max)
      val gs = for (x <- 0 until w; y <- 0 until h)
        yield (id * 17 + x * 11 + y * 3) % 256
      val bs = for (x <- 0 until w; y <- 0 until h)
        yield (id * 29 + x * 5 + y * 19) % 256
      assert(sg == gs.sum && sb == bs.sum)
    }
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

  test("phash: identical payloads share a code; codes are deterministic") {
    val out = SparkEntry.registry("mm_phash").fn(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // determinism: a second evaluation produces identical codes
    val again = SparkEntry.registry("mm_phash").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == again)
    // codes are 8-bit
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
    // identical payloads MUST collide: equal text => equal features => equal code
    val dupCodes = graft.Tables.documents(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("text"))
      .agg(org.apache.spark.sql.functions.collect_list("doc_id").as("ids"))
      .filter(org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("ids")) > 1)
      .collect()
    dupCodes.foreach { r =>
      val ids = r.getSeq[Long](1)
      assert(ids.map(byId).distinct.size == 1, s"payload-equal docs $ids differ in phash")
    }
    // bucket sizes are consistent with the code multiset
    val sizes = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(rows.forall(r => r.getLong(2) == sizes(r.getLong(1)).toLong))
  }
}
