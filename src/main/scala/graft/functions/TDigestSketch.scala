package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Merging t-digest (Dunning's sketch family, the shape behind
  * ClickHouse's quantileTDigest): bounded-error quantiles over an
  * UNBOUNDED value domain with a MERGEABLE fixed-size state — the one
  * sketch class the exact quantile family here (cent-domain cumulative
  * histograms: ch_quantiles/ch_mad; KMV bottom-k: ch_quantile_sample)
  * cannot replace, because those assume a bounded integer domain or
  * exact-below-k cardinality, while an AggregatingMergeTree-style MV
  * must fold arbitrary doubles forever in O(compression) state.
  *
  * Simplifications vs the paper, chosen for auditable bounds:
  *  - k0 (uniform) scale function: greedy left-to-right clustering
  *    with per-cluster weight cap W/compression. Uniform rank error
  *    (the paper's k1 sharpens the tails at the same state size);
  *    the bound below is what the registry certificate and the
  *    IncrementalSpec merge law assert.
  *  - state is a flat (mean, weight) pair array with an amortized
  *    in-place append region (doubling growth, compress at 4x
  *    compression entries), packed into the binary buffer with a
  *    used-count header — reduce mutates in place, so per-row cost is
  *    O(1) amortized, not a full state copy.
  *
  * ERROR BOUND: after any sequence of adds and merges, every cluster
  * carries weight <= 2W/compression (cap W'/compression at each
  * compress over the weights it saw, plus one input cluster that
  * itself obeys the prior cap), so a midpoint-rule quantile estimate
  * has rank error <= ~1.5 clusters ~= 3W/compression. The registry
  * certificate checks |rank(est) - qn| <= 3n/compression; the merge
  * law (merge of shard digests == whole-data digest, both within the
  * bound of the exact quantile) is IncrementalSpec's case.
  *
  * Determinism: compress sorts by (mean, weight) and clusters greedily
  * — a pure function of the input multiset — but the DIGEST is still
  * partition-order dependent (merge order changes intermediate caps),
  * so cross-engine oracling uses the rank certificate, not raw
  * estimate values (the ch_quantiles_approx device).
  */
object TDigestSketch {

  /** Greedy k1 compress (the paper's tail-sharpening scale function
    * k(q) = (δ/2π)·asin(2q−1)): sort (mean, weight) pairs, flush the
    * running cluster before an add would push its k-span past 1. The
    * cluster covering quantile q then has rank width ≤ W/k'(q) =
    * (2π/δ)·√(q(1−q))·W in a single pass — Θ(√(q(1−q))) of k0's
    * uniform W/δ cap, so p99/p999 clusters are ~10x (resp. ~30x at
    * δ=200) narrower at the SAME state size, which is the whole point
    * of quantileTDigest over a uniform sketch for tail dashboards.
    *
    * ERROR BOUND (the k1 analogue of the k0 bound above): merges
    * re-compress previously-capped clusters, which at most doubles a
    * span (one carried input cluster, itself obeying the prior cap),
    * and the midpoint rule reads within ~1.5 clusters — so the
    * certificate asserts empirical rank error ≤ 8π·√(q(1−q))·n/δ
    * (2x merge factor x ~1.3 midpoint slack over 2π√(q(1−q))n/δ),
    * floored at a few rows for integer-rank granularity. TDigestSpec/
    * IncrementalSpec assert it at p50/p99/p999 including after
    * shard merges; the ch_quantile_tdigest_k1 registry entry carries
    * it as the DuckDB-checked certificate.
    */
  private[graft] def compressK1(pairs: Array[Double], compression: Int): Array[Double] = {
    val n = pairs.length / 2
    if (n <= 1) return pairs
    val idx = Array.range(0, n).sortBy(i => (pairs(2 * i), pairs(2 * i + 1)))
    var total = 0.0
    var i = 0
    while (i < n) { total += pairs(2 * i + 1); i += 1 }
    def k(q: Double): Double = compression / (2 * math.Pi) *
      math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
    val out = Array.newBuilder[Double]
    var emitted = 0.0 // weight already flushed
    var cw = 0.0 // cluster weight
    var cs = 0.0 // cluster sum(mean * weight)
    var kStart = k(0.0)
    for (j <- idx) {
      val m = pairs(2 * j); val w = pairs(2 * j + 1)
      if (cw > 0 && k((emitted + cw + w) / total) - kStart > 1.0) {
        out += cs / cw; out += cw
        emitted += cw; cw = 0.0; cs = 0.0
        kStart = k(emitted / total)
      }
      cw += w; cs += m * w
    }
    if (cw > 0) { out += cs / cw; out += cw }
    out.result()
  }

  /** Greedy k0 compress: sort (mean, weight) pairs, merge cumulative
    * runs capped at totalWeight/compression. Returns a new flat
    * array.
    */
  private[graft] def compress(pairs: Array[Double], compression: Int): Array[Double] = {
    val n = pairs.length / 2
    if (n <= 1) return pairs
    val idx = Array.range(0, n).sortBy(i => (pairs(2 * i), pairs(2 * i + 1)))
    var total = 0.0
    var i = 0
    while (i < n) { total += pairs(2 * i + 1); i += 1 }
    val cap = total / compression
    val out = Array.newBuilder[Double]
    var cw = 0.0 // cluster weight
    var cs = 0.0 // cluster sum(mean * weight)
    for (j <- idx) {
      val m = pairs(2 * j); val w = pairs(2 * j + 1)
      if (cw > 0 && cw + w > cap) {
        out += cs / cw; out += cw
        cw = 0.0; cs = 0.0
      }
      cw += w; cs += m * w
    }
    if (cw > 0) { out += cs / cw; out += cw }
    out.result()
  }

  /** Midpoint-rule quantile from a digest's flat (mean, weight) pairs. */
  def quantile(pairs: Seq[Double], q: Double): Double = {
    val n = pairs.length / 2
    if (n == 0) return Double.NaN
    val idx = Array.range(0, n).sortBy(i => pairs(2 * i))
    val total = (0 until n).map(i => pairs(2 * i + 1)).sum
    val t = q * total
    var cum = 0.0
    var prevC = 0.0; var prevM = pairs(2 * idx(0))
    for (j <- idx) {
      val m = pairs(2 * j); val w = pairs(2 * j + 1)
      val c = cum + w / 2 // the cluster's rank position
      if (t <= c) {
        if (c == prevC) return m
        val f = (t - prevC) / (c - prevC)
        return if (cum == 0.0 && t <= w / 2) m // first half-cluster
        else prevM + f * (m - prevM)
      }
      prevC = c; prevM = m; cum += w
    }
    prevM
  }

  // ---- binary buffer layout: [long used][used x (mean, weight)] ----

  private def used(buf: Array[Byte]): Int =
    if (buf.isEmpty) 0
    else java.nio.ByteBuffer.wrap(buf).getLong(0).toInt

  private[graft] def pairsOf(buf: Array[Byte]): Array[Double] = {
    val u = used(buf)
    val out = new Array[Double](2 * u)
    val bb = java.nio.ByteBuffer.wrap(buf)
    var i = 0
    while (i < 2 * u) { out(i) = bb.getDouble(8 + 8 * i); i += 1 }
    out
  }

  private def packed(pairs: Array[Double], capacityPairs: Int): Array[Byte] = {
    val u = pairs.length / 2
    val cap = math.max(capacityPairs, u)
    val buf = new Array[Byte](8 + 16 * cap)
    val bb = java.nio.ByteBuffer.wrap(buf)
    bb.putLong(0, u.toLong)
    var i = 0
    while (i < 2 * u) { bb.putDouble(8 + 8 * i, pairs(i)); i += 1 }
    buf
  }

  final class Agg(compression: Int, qs: Seq[Double], k1: Boolean = false)
      extends Aggregator[java.lang.Double, Array[Byte], Seq[Double]] {

    private def compact(pairs: Array[Double]): Array[Double] =
      if (k1) compressK1(pairs, compression) else compress(pairs, compression)

    def zero: Array[Byte] = Array.emptyByteArray

    def reduce(buf: Array[Byte], in: java.lang.Double): Array[Byte] = {
      if (in == null) return buf
      val u = used(buf)
      val capPairs = if (buf.isEmpty) 0 else (buf.length - 8) / 16
      if (u < capPairs) { // in-place append: the amortized-O(1) path
        val bb = java.nio.ByteBuffer.wrap(buf)
        bb.putDouble(8 + 16 * u, in.doubleValue)
        bb.putDouble(8 + 16 * u + 8, 1.0)
        bb.putLong(0, (u + 1).toLong)
        buf
      } else if (capPairs >= 4 * compression) {
        // full: fold the buffer down to <= compression clusters, keep
        // the same capacity (state size is bounded by compression)
        val folded = compact(pairsOf(buf))
        val next = packed(folded, capPairs)
        reduce(next, in)
      } else {
        // grow by doubling up to the 4x-compression working size
        val next = packed(pairsOf(buf),
          math.min(math.max(64, capPairs * 2), 4 * compression))
        reduce(next, in)
      }
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val both = pairsOf(a) ++ pairsOf(b)
      packed(compact(both), compression)
    }

    def finish(buf: Array[Byte]): Seq[Double] = {
      val p = compact(pairsOf(buf))
      qs.map(q => quantile(p.toIndexedSeq, q))
    }

    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `tdigestQuantiles(compression, qs)(value)` as a Column aggregate.
    * `k1 = true` selects the tail-sharpened scale function.
    */
  def apply(compression: Int, qs: Seq[Double], value: Column,
      k1: Boolean = false): Column =
    udaf(new Agg(compression, qs, k1),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[java.lang.Double]())(value)
}
