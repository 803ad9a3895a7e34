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

    def reduce(buf: Array[Byte], boxed: java.lang.Long): Array[Byte] = {
      if (boxed == null) return buf
      val x = key(boxed.longValue)
      val xs = unpack(buf)
      val i = java.util.Arrays.binarySearch(xs, x)
      if (i >= 0) buf // already present
      else {
        val at = -i - 1
        if (at >= k) buf // larger than current k-th minimum: irrelevant
        else {
          val n = math.min(xs.length + 1, k)
          val next = new Array[Long](n)
          System.arraycopy(xs, 0, next, 0, at)
          next(at) = x
          System.arraycopy(xs, at, next, at + 1, n - at - 1)
          pack(next)
        }
      }
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
}
