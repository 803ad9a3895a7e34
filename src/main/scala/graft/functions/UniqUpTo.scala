package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ClickHouse's `uniqUpTo(N)(x)`: the exact distinct count while it
  * is <= N, and the saturation sentinel N+1 once it exceeds N
  * (CH docs: "Calculates the number of different argument values if
  * it is less than or equal to N; N+1 otherwise").
  *
  * The whole point versus `count(DISTINCT x)` is BOUNDED STATE: the
  * aggregation buffer holds at most N+1 keys per group no matter the
  * true cardinality, so at 100 TB the partial-agg state and the
  * shuffle carry (N+1)*8 bytes per group instead of the full key
  * space — the same reason ch_topk_sketch exists next to ch_topk.
  *
  * The buffer is a sorted distinct long array packed into bytes
  * (binary encoders keep the UDAF buffer opaque and cheap, same
  * pattern as [[Hll.StateAgg]]). Once the array reaches N+1 entries
  * it stops growing — any further input or merge cannot change the
  * answer, so saturation is absorbing and merge stays correct.
  */
object UniqUpTo {

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

  /** Input is BOXED Long: the primitive encoder silently decodes a
    * NULL input as 0, which would count a phantom key — boxing keeps
    * nulls visible so they are skipped like count(DISTINCT) does.
    */
  final class Agg(limit: Int) extends Aggregator[java.lang.Long, Array[Byte], Long] {
    private val cap = limit + 1

    def zero: Array[Byte] = Array.emptyByteArray

    def reduce(buf: Array[Byte], boxed: java.lang.Long): Array[Byte] = {
      if (boxed == null) return buf
      val x = boxed.longValue
      val n = buf.length / 8
      if (n >= cap) return buf // saturated: answer already N+1
      // r13: binary-search the packed big-endian longs IN PLACE — the
      // former unpack-per-row allocated (and copied) the whole buffer
      // for every input row; the common row (key already present /
      // group saturated) now touches no heap at all, and allocation
      // is confined to true insertions (<= cap per group lifetime).
      val bb = java.nio.ByteBuffer.wrap(buf)
      var lo = 0
      var hi = n - 1
      var at = n
      var found = false
      while (lo <= hi && !found) {
        val mid = (lo + hi) >>> 1
        val v = bb.getLong(mid * 8)
        if (v == x) found = true
        else if (v < x) lo = mid + 1
        else { at = mid; hi = mid - 1 }
      }
      if (found) buf
      else {
        val next = new Array[Byte](buf.length + 8)
        System.arraycopy(buf, 0, next, 0, at * 8)
        java.nio.ByteBuffer.wrap(next).putLong(at * 8, x)
        System.arraycopy(buf, at * 8, next, at * 8 + 8, buf.length - at * 8)
        next
      }
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val (xs, ys) = (unpack(a), unpack(b))
      if (xs.length >= cap) a
      else if (ys.length >= cap) b
      else {
        // merge two sorted distinct arrays, stop at cap
        val out = new Array[Long](math.min(xs.length + ys.length, cap))
        var (i, j, k) = (0, 0, 0)
        while (k < out.length && (i < xs.length || j < ys.length)) {
          val take =
            if (i >= xs.length) { val v = ys(j); j += 1; v }
            else if (j >= ys.length) { val v = xs(i); i += 1; v }
            else if (xs(i) < ys(j)) { val v = xs(i); i += 1; v }
            else if (ys(j) < xs(i)) { val v = ys(j); j += 1; v }
            else { val v = xs(i); i += 1; j += 1; v }
          out(k) = take; k += 1
        }
        pack(java.util.Arrays.copyOf(out, k))
      }
    }

    def finish(buf: Array[Byte]): Long = buf.length / 8L
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.scalaLong
  }

  /** `uniqUpTo(n)(c)` as a Column aggregate; `c` must be LongType. */
  def apply(c: Column, n: Int): Column = udaf(new Agg(n), Encoders.LONG)(c)
}
