package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("bpeTrain learns the classic corpus merges in order") {
    // Sennrich's worked example (without the </w> terminal): freqs
    // low x5, lower x2, newest x6, widest x3. Hand derivation:
    //   step 1: es = 6+3 = 9 ties st = 9 -> (e,s) wins pair-asc
    //   step 2: (es,t) = 9
    //   step 3: (l,o) = 7 ties (o,w) = 7 -> (l,o) wins
    //   step 4: (lo,w) = 5+2 = 7
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, 4)
      .orderBy("step")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L)))
  }

  test("bpeTrain merge application is greedy left-to-right, non-overlapping") {
    // "aaaa" x1 with top pair (a,a): one fold pass must yield
    // [aa, aa], never [aa, a, a] twice-counted or an overlap
    val docs = Seq("aaaa aaaa aaaa").toDF("text")
    val m = TextAnalysis.bpeTrain(docs, 2).orderBy("step").collect()
    // step 1 merges (a,a) scoring 9 (3 words x 3 adjacent pairs);
    // step 2 merges (aa,aa) scoring 3 (one pair per word after step 1)
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "a" &&
      m(0).getLong(3) == 9L)
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "aa" &&
      m(1).getLong(3) == 3L)
  }

  test("bpeTrain stops early when no pairs remain") {
    val docs = Seq("ab ab").toDF("text")
    val m = TextAnalysis.bpeTrain(docs, 10).collect()
    assert(m.length == 1, s"expected 1 merge, got ${m.toSeq}")
  }
}
