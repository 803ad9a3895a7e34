package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class SpaceSavingSpec extends AnyFunSuite {

  /** Deterministic skewed stream: key i appears `freq(i)` times. */
  private def stream(freqs: Map[String, Int], seed: Long): Seq[String] = {
    val all = freqs.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }
    new Random(seed).shuffle(all)
  }

  test("below capacity the sketch is exact") {
    val freqs = (1 to 20).map(i => s"k$i" -> i * 3).toMap
    val sk = new SpaceSaving(64)
    stream(freqs, 1L).foreach(sk.add(_))
    val got = sk.topK(20).map { case (k, c, e) => (k, c, e) }
    assert(got.forall(_._3 == 0L), "no evictions -> zero error")
    assert(got.map(t => t._1 -> t._2).toMap == freqs.view.mapValues(_.toLong).toMap)
  }

  test("under forced overflow: overestimates with bounded error, heavy hitters kept") {
    // 50 distinct keys, capacity 16. Heavy keys h1..h4 dominate.
    val heavy = Map("h1" -> 500, "h2" -> 400, "h3" -> 300, "h4" -> 200)
    val noise = (1 to 46).map(i => s"z$i" -> 10).toMap
    val freqs = heavy ++ noise
    val n = freqs.values.sum
    val sk = new SpaceSaving(16)
    stream(freqs, 7L).foreach(sk.add(_))
    assert(sk.n == n)
    val est = sk.topK(16).map { case (k, c, e) => k -> ((c, e)) }.toMap
    // Guarantee 1: any key with true freq > n/capacity is present.
    val threshold = n / 16
    for ((k, f) <- freqs if f > threshold)
      assert(est.contains(k), s"heavy hitter $k (freq $f > $threshold) evicted")
    // Guarantee 2: true <= estimate <= true + error.
    for ((k, (c, e)) <- est if freqs.contains(k)) {
      val truth = freqs(k)
      assert(c >= truth, s"$k underestimated: $c < $truth")
      assert(c - e <= truth, s"$k error bound violated: $c - $e > $truth")
    }
    // Guarantee 3: top-4 by estimate are exactly the heavy keys.
    assert(sk.topK(4).map(_._1).toSet == heavy.keySet)
  }

  test("merge of partition sketches preserves the guarantees") {
    val heavy = Map("h1" -> 600, "h2" -> 450, "h3" -> 350)
    val noise = (1 to 40).map(i => s"z$i" -> 8).toMap
    val freqs = heavy ++ noise
    val all = stream(freqs, 13L)
    // Split into 4 "partitions", sketch each, tree-merge.
    val parts = all.grouped((all.size + 3) / 4).toSeq
    val merged = parts
      .map(p => p.foldLeft(new SpaceSaving(16))((sk, v) => sk.add(v)))
      .reduce((a, b) => a.merge(b))
    assert(merged.n == freqs.values.sum.toLong)
    val est = merged.topK(16).map { case (k, c, e) => k -> ((c, e)) }.toMap
    for ((k, f) <- heavy) {
      assert(est.contains(k), s"merge lost heavy hitter $k")
      val (c, e) = est(k)
      assert(c >= f && c - e <= f, s"merge bound violated for $k: ($c, $e) vs $f")
    }
    assert(merged.topK(3).map(_._1).toSet == heavy.keySet)
  }
}
