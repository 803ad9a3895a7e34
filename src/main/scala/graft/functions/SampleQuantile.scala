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

  /** State: pairs (sign-flipped hash, value bits) flattened into one
    * long array sorted by hash, packed as bytes.
    */
  private def unpack(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](b.length / 8)
    java.nio.ByteBuffer.wrap(b).asLongBuffer().get(out)
    out
  }

  private def pack(xs: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(xs.length * 8)
    bb.asLongBuffer().put(xs)
    bb.array()
  }

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

  final class Agg(k: Int, qs: Seq[Double])
      extends Aggregator[(java.lang.Long, java.lang.Double), Array[Byte], Seq[Double]] {

    def zero: Array[Byte] = Array.emptyByteArray

    // reduce works DIRECTLY on the packed bytes: the common cases (a
    // hash above the k-th minimum, a duplicate) cost one buffer wrap
    // and a binary search — no per-row unpack/repack of the whole
    // state, which would turn a 16 KB buffer into gigabytes of copy
    // traffic over a large group.
    def reduce(buf: Array[Byte], in: (java.lang.Long, java.lang.Double)): Array[Byte] = {
      val (h0, v0) = in
      if (h0 == null || v0 == null) return buf
      val h = key(h0.longValue)
      val bb = java.nio.ByteBuffer.wrap(buf)
      val n = buf.length / 16
      if (n >= k && h >= bb.getLong((k - 1) * 16)) return buf
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bb.getLong(mid * 16) < h) lo = mid + 1 else hi = mid
      }
      if (lo < n && bb.getLong(lo * 16) == h) return buf // row hash seen
      val m = math.min(n + 1, k)
      val next = new Array[Byte](m * 16)
      System.arraycopy(buf, 0, next, 0, lo * 16)
      val nb = java.nio.ByteBuffer.wrap(next)
      nb.putLong(lo * 16, h)
      nb.putLong(lo * 16 + 8, java.lang.Double.doubleToLongBits(v0.doubleValue))
      System.arraycopy(buf, lo * 16, next, lo * 16 + 16, (m - lo) * 16 - 16)
      next
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val xs = unpack(a); val ys = unpack(b)
      if (xs.isEmpty) return b
      if (ys.isEmpty) return a
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
      pack(if (m == n) out else java.util.Arrays.copyOf(out, 2 * m))
    }

    def finish(buf: Array[Byte]): Seq[Double] = {
      val xs = unpack(buf)
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
