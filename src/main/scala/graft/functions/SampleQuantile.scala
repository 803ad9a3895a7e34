package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory quantile via deterministic bottom-k sampling — the
  * idea behind ClickHouse's default `quantile()` (reservoir of 8192),
  * made deterministic and mergeable the KMV way: keep the k rows
  * whose 64-bit row hashes are smallest. That set is a uniform random
  * sample of the group, it is a pure FUNCTION of the data (no RNG —
  * identical under any partitioning, retry, or merge order), merge is
  * sorted-union-truncate, and state is bounded at 16k bytes per group
  * regardless of group size — the 100 TB answer when exact
  * percentile state (all values) cannot fit. While the group has at
  * most k rows the sample IS the group and the quantiles are EXACT,
  * which is what lets DuckDB verify the operator cell-exact at test
  * scale; the overflow regime is pinned by a spec instead.
  */
object SampleQuantile {

  private def key(x: Long): Long = x ^ Long.MinValue

  /** percentile_cont / quantile_cont interpolation: h = (n-1)q,
    * v = v_lo + (h - lo) * (v_hi - v_lo) — the formula both Spark's
    * `percentile` and DuckDB's `quantile_cont` use, so the exact
    * (unsaturated) regime reproduces them bit-for-bit before the
    * defensive 6-decimal round.
    */
  def interpolate(sorted: Array[Double], q: Double): Double = {
    val h = (sorted.length - 1) * q
    val lo = h.toInt
    if (lo + 1 >= sorted.length) sorted(sorted.length - 1)
    else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
  }

  /** r13 state layout (guide §1.2 step 2, per-task work): the former
    * always-sorted packed array cost an allocation + full-buffer copy
    * PER INSERT in the growth regime (every row while n < k), i.e.
    * O(n²) bytes of copy traffic per group — gigabytes over a bench
    * pass, the measured dominant cost of ch_quantile_sample. The
    * buffer is now [long nSorted | long nTotal | records… | slack]:
    * records[0, nSorted) are sorted-by-hash and deduplicated,
    * records[nSorted, nTotal) are O(1) appends; the array doubles
    * amortized up to 2k records and is then normalized in place
    * (sort + dedup + truncate to the k smallest hashes). The KEPT SET
    * — the k smallest distinct row hashes with their values — is a
    * pure function of the input multiset, so results are identical;
    * only when two DISTINCT rows collide in the full 64-bit hash (a
    * case the contract already excludes: rowHash must identify the
    * row) does the kept value change from arrival-order-dependent to
    * the deterministic smaller-value-bits one.
    */
  private final val HDR = 16 // two long header fields
  private final val REC = 16 // (hash, valueBits)

  @inline private def nSorted(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).getLong(0).toInt
  @inline private def nTotal(b: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(b).getLong(8).toInt

  /** Sort records[0, n) of the stride-2 long array by (hash, value
    * bits) — a hand-rolled dual-pivot-free quicksort over 16-byte
    * records (Arrays.sort cannot sort pairs). Deterministic total
    * order; ties in hash are broken by value bits so dedup keeps a
    * partition-order-independent representative.
    */
  private def sortRecords(a: Array[Long], lo0: Int, hi0: Int): Unit = {
    var lo = lo0; var hi = hi0 // inclusive record indices
    // middle-element pivot; recursion goes to the SMALLER partition
    // and the larger is handled by the loop, so stack depth is
    // O(log n) even on pathological hash patterns
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val pm = a(2 * mid); val pv = a(2 * mid + 1)
      var i = lo; var j = hi
      while (i <= j) {
        while (a(2 * i) < pm || (a(2 * i) == pm && a(2 * i + 1) < pv)) i += 1
        while (a(2 * j) > pm || (a(2 * j) == pm && a(2 * j + 1) > pv)) j -= 1
        if (i <= j) {
          val th = a(2 * i); val tv = a(2 * i + 1)
          a(2 * i) = a(2 * j); a(2 * i + 1) = a(2 * j + 1)
          a(2 * j) = th; a(2 * j + 1) = tv
          i += 1; j -= 1
        }
      }
      if (j - lo < hi - i) { sortRecords(a, lo, j); lo = i }
      else { sortRecords(a, i, hi); hi = j }
    }
  }

  /** Normalized (sorted, deduped, ≤k records, no header, no slack)
    * long-pair view of any buffer state.
    */
  private def normalized(b: Array[Byte], k: Int): Array[Long] = {
    if (b.length == 0) return Array.emptyLongArray
    val ns = nSorted(b); val nt = nTotal(b)
    val xs = new Array[Long](2 * nt)
    java.nio.ByteBuffer.wrap(b, HDR, nt * REC).asLongBuffer().get(xs)
    if (ns < nt) sortRecords(xs, 0, nt - 1)
    // dedup by hash (keep first = smallest value bits) + truncate to k
    var m = 0; var i = 0
    while (i < nt && m < k) {
      if (m == 0 || xs(2 * m - 2) != xs(2 * i)) {
        xs(2 * m) = xs(2 * i); xs(2 * m + 1) = xs(2 * i + 1); m += 1
      }
      i += 1
    }
    if (2 * m == xs.length) xs else java.util.Arrays.copyOf(xs, 2 * m)
  }

  /** Re-pack a normalized record array as a headered buffer. */
  private def packState(xs: Array[Long], slackRecs: Int): Array[Byte] = {
    val n = xs.length / 2
    val out = new Array[Byte](HDR + (n + slackRecs) * REC)
    val bb = java.nio.ByteBuffer.wrap(out)
    bb.putLong(0, n.toLong); bb.putLong(8, n.toLong)
    bb.position(HDR)
    bb.asLongBuffer().put(xs)
    out
  }

  final class Agg(k: Int, qs: Seq[Double])
      extends Aggregator[(java.lang.Long, java.lang.Double), Array[Byte], Seq[Double]] {

    def zero: Array[Byte] = Array.emptyByteArray

    // reduce appends in place (the buffer object is threaded through
    // the aggregation, so mutation is safe); the saturated fast path
    // (hash above the current k-th minimum once the sorted region
    // holds k) and the sorted-region duplicate check never touch the
    // heap. Appends between normalizations may hold transient
    // duplicates; normalization removes them.
    def reduce(buf: Array[Byte], in: (java.lang.Long, java.lang.Double)): Array[Byte] = {
      val (h0, v0) = in
      if (h0 == null || v0 == null) return buf
      val h = key(h0.longValue)
      val v = java.lang.Double.doubleToLongBits(v0.doubleValue)
      var b = buf
      if (b.length == 0) {
        b = new Array[Byte](HDR + 64 * REC)
        val bb = java.nio.ByteBuffer.wrap(b)
        bb.putLong(0, 0L); bb.putLong(8, 1L)
        bb.putLong(HDR, h); bb.putLong(HDR + 8, v)
        return b
      }
      val bb = java.nio.ByteBuffer.wrap(b)
      val ns = bb.getLong(0).toInt
      var nt = bb.getLong(8).toInt
      if (ns >= k && h >= bb.getLong(HDR + (k - 1) * REC)) return b
      // duplicate check against the sorted region only
      var lo = 0; var hi = ns
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bb.getLong(HDR + mid * REC) < h) lo = mid + 1 else hi = mid
      }
      if (lo < ns && bb.getLong(HDR + lo * REC) == h) return b
      var cap = (b.length - HDR) / REC
      if (nt == cap) {
        if (cap < 2 * k) { // amortized doubling
          val grown = java.util.Arrays.copyOf(b,
            HDR + math.min(math.max(2 * cap, 64), 2 * k) * REC)
          b = grown
        } else { // full at max capacity: normalize in place
          val xs = normalized(b, k)
          b = packState(xs, slackRecs = cap - xs.length / 2)
          val m = xs.length / 2
          if (m >= k && h >= xs(2 * (k - 1))) return b
          nt = m
        }
        cap = (b.length - HDR) / REC
      }
      val nb = java.nio.ByteBuffer.wrap(b)
      nb.putLong(HDR + nt * REC, h)
      nb.putLong(HDR + nt * REC + 8, v)
      nb.putLong(8, (nt + 1).toLong)
      b
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val xs = normalized(a, k); val ys = normalized(b, k)
      if (xs.isEmpty) return packState(ys, 0)
      if (ys.isEmpty) return packState(xs, 0)
      val n = math.min(xs.length / 2 + ys.length / 2, k)
      val out = new Array[Long](2 * n)
      var (i, j, m) = (0, 0, 0)
      while (m < n && (i < xs.length / 2 || j < ys.length / 2)) {
        val takeX = j >= ys.length / 2 ||
          (i < xs.length / 2 && xs(2 * i) <= ys(2 * j))
        val (h, v) = if (takeX) (xs(2 * i), xs(2 * i + 1)) else (ys(2 * j), ys(2 * j + 1))
        if (takeX) i += 1 else j += 1
        if (m == 0 || out(2 * m - 2) != h) {
          out(2 * m) = h; out(2 * m + 1) = v; m += 1
        }
      }
      packState(if (m == n) out else java.util.Arrays.copyOf(out, 2 * m), 0)
    }

    def finish(buf: Array[Byte]): Seq[Double] = {
      val xs = normalized(buf, k)
      val vs = Array.tabulate(xs.length / 2)(i =>
        java.lang.Double.longBitsToDouble(xs(2 * i + 1)))
      java.util.Arrays.sort(vs)
      if (vs.isEmpty) qs.map(_ => Double.NaN)
      else qs.map(q => interpolate(vs, q))
    }

    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `sampleQuantiles(k, qs)(rowHash, value)` as a Column aggregate:
    * `rowHash` must identify the ROW (e.g. xxhash64 of its key), so
    * every row is an independent coin flip into the sample.
    */
  def apply(k: Int, qs: Seq[Double], rowHash: Column, value: Column): Column =
    udaf(new Agg(k, qs),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(java.lang.Long, java.lang.Double)]())(
      rowHash, value)
}
