package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("graft_polyhash matches the reference implementation (codegen path)") {
    GraftFunctions.register(spark)
    val samples = Seq("", "a", "hello world", "spark " * 100, "ü§ünicode",
      "the quick brown fox")
    val got = samples.toDF("s")
      .select(col("s"), expr("graft_polyhash(s)").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- samples) {
      val want = PolyHash64.hash(s.getBytes("UTF-8"), 1000003L)
      assert(got(s) == want, s"mismatch for '$s'")
    }
  }

  test("graft_polyhash is stable and collision-free on the documents table") {
    GraftFunctions.register(spark)
    val df = graft.Tables.documents(spark, sf)
      .select(expr("graft_polyhash(text)").as("h"), col("text"))
    val n = df.count()
    val uniqTexts = df.select("text").distinct().count()
    val uniqHashes = df.select("h").distinct().count()
    assert(uniqHashes == uniqTexts, s"hash collisions: $uniqHashes of $uniqTexts")
    assert(n > 0)
  }
}
