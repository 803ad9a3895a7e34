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

  test("low-16-bit congruence: hash & 0xffff == fold mod 65536 (mm_phash oracle law)") {
    // the mm_phash DuckDB oracle replays only the low 16 bits of the
    // rolling hash, relying on low bits of a product depending only on
    // low bits of the operands — pin that congruence against the full
    // 64-bit wrapping reference on random byte strings
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val bytes = Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte)
      val full = PolyHash64.hash(bytes, 1000003L) & 0xffffL
      val folded = bytes.foldLeft(0L)((h, b) => (h * 1000003L + (b & 0xff)) % 65536L)
      assert(full == folded, s"congruence broke at len ${bytes.length}")
    }
  }

  test("graft_polyhash rejects non-castable input at analysis time") {
    GraftFunctions.register(spark)
    val df = Seq(Seq(1L, 2L)).toDF("arr")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_polyhash(arr)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_polyhash") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("graft_minhash skips null elements instead of crashing") {
    GraftFunctions.register(spark)
    val withNulls = Seq(Tuple1(Seq(Option(1L), None, Option(2L)))).toDF("hs")
      .select(expr("graft_minhash(hs)").as("sig")).head().getSeq[Long](0)
    val without = Seq(Tuple1(Seq(Option(1L), Option(2L)))).toDF("hs")
      .select(expr("graft_minhash(hs)").as("sig")).head().getSeq[Long](0)
    assert(withNulls == without)
    assert(withNulls == MinHashSig.sig(Array(1L, 2L)).toSeq)
  }
}
