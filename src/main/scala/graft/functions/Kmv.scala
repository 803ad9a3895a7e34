package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch — the mergeable
  * middle ground between [[UniqUpTo]] (exact, saturates to a
  * sentinel) and [[Hll]] (always an estimate): EXACT while the true
  * cardinality is below k, and an unbiased (k-1)/U(k) estimate with
  * ~1/sqrt(k-2) relative error above it (Bar-Yossef et al. 2002;
  * CH's `uniqCombined` uses the same hash-ordered-minima idea for
  * its mid-range mode).
  *
  * State is the k smallest DISTINCT 64-bit hashes in unsigned order,
  * packed into bytes — bounded at 8k bytes per group regardless of
  * input size, merge = sorted-array union truncated to k, so partial
  * aggregation and shuffle carry fixed-size state at any scale.
  */
object Kmv {

  /** Unsigned-order key: flipping the sign bit maps unsigned 64-bit
    * order onto signed long order, so Arrays.binarySearch/sort work.
    */
  private def key(x: Long): Long = x ^ Long.MinValue

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

  /** Estimate from a packed state: exact count below k, (k-1)/U(k)
    * above, where U(k) is the k-th smallest hash as a fraction of
    * the full 64-bit space.
    */
  def estimate(state: Array[Byte], k: Int): Long = {
    val xs = unpack(state)
    if (xs.length < k) xs.length.toLong
    else {
      // xs holds sign-flipped (offset-binary) values: flipped =
      // unsigned - 2^63, so unsigned/2^64 = flipped/2^64 + 1/2.
      val kth = xs(k - 1)
      val frac = (kth.toDouble / 18446744073709551616.0) + 0.5 // 2^64
      math.round((k - 1).toDouble / frac)
    }
  }

  /** Input is the pre-hashed value (xxhash64 of the column): boxed so
    * NULL stays visible and is skipped, like count(DISTINCT).
    */
  final class Agg(k: Int) extends Aggregator[java.lang.Long, Array[Byte], Long] {

    def zero: Array[Byte] = Array.emptyByteArray

    // byte-level reduce: the common cases (above the k-th minimum,
    // duplicate) never unpack the state — one wrap + binary search.
    def reduce(buf: Array[Byte], boxed: java.lang.Long): Array[Byte] = {
      if (boxed == null) return buf
      val x = key(boxed.longValue)
      val bb = java.nio.ByteBuffer.wrap(buf)
      val n = buf.length / 8
      if (n >= k && x >= bb.getLong((k - 1) * 8)) return buf
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bb.getLong(mid * 8) < x) lo = mid + 1 else hi = mid
      }
      if (lo < n && bb.getLong(lo * 8) == x) return buf // already present
      val m = math.min(n + 1, k)
      val next = new Array[Byte](m * 8)
      System.arraycopy(buf, 0, next, 0, lo * 8)
      java.nio.ByteBuffer.wrap(next).putLong(lo * 8, x)
      System.arraycopy(buf, lo * 8, next, lo * 8 + 8, (m - lo) * 8 - 8)
      next
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val (xs, ys) = (unpack(a), unpack(b))
      if (xs.isEmpty) return b
      if (ys.isEmpty) return a
      val out = new Array[Long](math.min(xs.length + ys.length, k))
      var (i, j, n) = (0, 0, 0)
      while (n < out.length && (i < xs.length || j < ys.length)) {
        val takeX = j >= ys.length || (i < xs.length && xs(i) <= ys(j))
        val v = if (takeX) xs(i) else ys(j)
        if (takeX) i += 1 else j += 1
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      pack(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }

    def finish(buf: Array[Byte]): Long = estimate(buf, k)

    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
  }

  /** `kmv(k)(xxhash64(col))` as a Column aggregate. */
  def apply(k: Int, hashes: Column): Column =
    udaf(new Agg(k), Encoders.LONG)(hashes)

  /** Same aggregation, but finishing with the packed STATE instead of
    * the estimate — the mergeable hand-off a segment-overlap service
    * ships between jobs (CH's uniqState idea for KMV).
    */
  final class StateAgg(k: Int)
      extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    private val inner = new Agg(k)
    def zero: Array[Byte] = inner.zero
    def reduce(b: Array[Byte], x: java.lang.Long): Array[Byte] = inner.reduce(b, x)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `kmvState(k)(xxhash64(col))` as a Column aggregate. */
  def state(k: Int, hashes: Column): Column =
    udaf(new StateAgg(k), Encoders.LONG)(hashes)

  /** Theta-sketch-style set operations on two KMV states (the
    * Dasgupta et al. theta-sketch framework restricted to KMV): union
    * and intersection cardinality estimates. theta is the smaller of
    * the two sketches' k-th minima (1.0 for an unsaturated sketch);
    * values >= theta are discarded from both sides, the survivors are
    * an exact sample of the union at rate theta. While BOTH true sets
    * are below k the result is EXACT — which is what makes the
    * operator DuckDB-oracle-able at test scale.
    */
  def setOps(a: Array[Byte], b: Array[Byte], k: Int): (Long, Long) = {
    val xs = unpack(a); val ys = unpack(b)
    def thetaOf(s: Array[Long]): Option[Long] =
      if (s.length < k) None else Some(s(k - 1))
    val theta = (thetaOf(xs), thetaOf(ys)) match {
      case (Some(t1), Some(t2)) => Some(math.min(t1, t2))
      case (t1, t2)             => t1.orElse(t2)
    }
    val sa = theta.fold(xs)(t => xs.takeWhile(_ < t))
    val sb = theta.fold(ys)(t => ys.takeWhile(_ < t))
    // sorted-merge counts over the theta-filtered samples
    var (i, j, common, unionN) = (0, 0, 0L, 0L)
    while (i < sa.length || j < sb.length) {
      unionN += 1
      if (j >= sb.length || (i < sa.length && sa(i) < sb(j))) i += 1
      else if (i >= sa.length || sb(j) < sa(i)) j += 1
      else { common += 1; i += 1; j += 1 }
    }
    theta match {
      case None => (unionN, common) // both unsaturated: exact
      case Some(t) =>
        val frac = (t.toDouble / 18446744073709551616.0) + 0.5
        (math.round(unionN / frac), math.round(common / frac))
    }
  }
}
