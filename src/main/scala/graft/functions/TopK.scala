package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k selection aggregate: the k best (score DESC, id ASC)
  * ids per group in O(k) mergeable state — the streaming replacement
  * for a `row_number().over(Window...)` top-k when the ranked stream
  * is too large to SORT.
  *
  * Why this exists (the r13 sf100 ladder finding): ann_knn_join's
  * candidate stream is n·nprobe·n/cells rows (~1.1e10 at 2M dim-256
  * vectors). The window formulation never shuffles it — but
  * WindowGroupLimit still requires a per-partition SORT of the full
  * stream below it, and at sf100 that sort's spill (~300 GB of
  * (cell, query, id, cos) rows) exceeded any single host's disk.
  * Selection does not need sorted input: a per-group bounded heap
  * consumes the stream IN PLACE in the same stage that produces it
  * (ObjectHashAggregate partials), so candidates are reduced to
  * k ids per group before anything is written anywhere — the shuffle
  * and the sort both disappear from the candidate path.
  *
  * State: n <= k entries of (sortKey, id), 16 bytes each, kept sorted
  * ascending so the common case (candidate worse than the current
  * k-th) is ONE comparison against the last entry. sortKey encodes
  * (score DESC, id ASC) lexicographically: the IEEE-sortable-bits map
  * (flip sign bit for positives, all bits for negatives) is inverted
  * so ascending longs mean descending scores; ties break on the
  * smaller id. Merge is a sorted-array union truncated to k —
  * associative and commutative, so map-side partials are exact.
  */
object TopK {

  /** Ascending SIGNED-long order over this key == (score DESC):
    * the sortable-double-bits map (flip all but the sign bit for
    * negatives — signed-comparable ascending), then bitwise NOT
    * (strictly monotone decreasing, no overflow at MinValue). */
  private[graft] def sortKey(score: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(score)
    ~(bits ^ ((bits >> 63) & 0x7fffffffffffffffL))
  }

  final class Agg(k: Int)
      extends Aggregator[(Double, java.lang.Long), Array[Byte], Seq[Long]] {

    def zero: Array[Byte] = Array.emptyByteArray

    private def entryKey(bb: java.nio.ByteBuffer, i: Int): Long =
      bb.getLong(i * 16)
    private def entryId(bb: java.nio.ByteBuffer, i: Int): Long =
      bb.getLong(i * 16 + 8)

    /** True when (ka, ia) orders before (kb, ib). */
    private def lt(ka: Long, ia: Long, kb: Long, ib: Long): Boolean =
      ka < kb || (ka == kb && ia < ib)

    def reduce(buf: Array[Byte], in: (Double, java.lang.Long)): Array[Byte] = {
      if (in == null || in._2 == null) return buf
      val sk = sortKey(in._1)
      val id = in._2.longValue
      val bb = java.nio.ByteBuffer.wrap(buf)
      val n = buf.length / 16
      // common case: full heap and the candidate is not better than
      // the current k-th — one comparison, no allocation
      if (n >= k && !lt(sk, id, entryKey(bb, k - 1), entryId(bb, k - 1)))
        return buf
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(entryKey(bb, mid), entryId(bb, mid), sk, id)) lo = mid + 1
        else hi = mid
      }
      val m = math.min(n + 1, k)
      val next = new Array[Byte](m * 16)
      System.arraycopy(buf, 0, next, 0, lo * 16)
      val nb = java.nio.ByteBuffer.wrap(next)
      nb.putLong(lo * 16, sk)
      nb.putLong(lo * 16 + 8, id)
      System.arraycopy(buf, lo * 16, next, lo * 16 + 16,
        math.max(0, (m - lo) * 16 - 16))
      next
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val (na, nb) = (a.length / 16, b.length / 16)
      val ba = java.nio.ByteBuffer.wrap(a)
      val bbf = java.nio.ByteBuffer.wrap(b)
      val m = math.min(na + nb, k)
      val out = new Array[Byte](m * 16)
      val ob = java.nio.ByteBuffer.wrap(out)
      var (i, j, n) = (0, 0, 0)
      while (n < m) {
        val takeA = j >= nb || (i < na &&
          lt(entryKey(ba, i), entryId(ba, i), entryKey(bbf, j), entryId(bbf, j)))
        if (takeA) {
          ob.putLong(n * 16, entryKey(ba, i)); ob.putLong(n * 16 + 8, entryId(ba, i))
          i += 1
        } else {
          ob.putLong(n * 16, entryKey(bbf, j)); ob.putLong(n * 16 + 8, entryId(bbf, j))
          j += 1
        }
        n += 1
      }
      out
    }

    def finish(buf: Array[Byte]): Seq[Long] = {
      val bb = java.nio.ByteBuffer.wrap(buf)
      Seq.tabulate(buf.length / 16)(i => entryId(bb, i))
    }

    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** `topK(k)(score, id)` — ids of the k largest scores, best first,
    * ties to the smaller id. */
  def apply(k: Int, score: Column, id: Column): Column =
    udaf(new Agg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, java.lang.Long)]())(
      score, id)

  /** Bottom-k selection by (STRING key ASC, id ASC) in O(k) mergeable
    * state — the [[Agg]] device for orderings a double cannot encode
    * (ch_grouparray_sample's first-k-by-md5-hash membership: the full
    * 32-hex key decides ties, so truncating it into a double mantissa
    * would change the sample). State is a k-bounded sorted Seq —
    * selection happens in the scan stage's partials, so the
    * partitionBy-window + per-group sort this replaces (one task per
    * group key) never materializes.
    */
  final class MinKByKey(k: Int)
      extends Aggregator[(String, java.lang.Long), Seq[(String, Long)], Seq[Long]] {
    private val ord =
      Ordering.Tuple2(Ordering.String, Ordering.Long)

    def zero: Seq[(String, Long)] = Nil

    def reduce(buf: Seq[(String, Long)],
        in: (String, java.lang.Long)): Seq[(String, Long)] = {
      if (in == null || in._1 == null || in._2 == null) return buf
      val e = (in._1, in._2.longValue)
      // common case: full buffer and the candidate orders after the
      // current k-th — one comparison, no allocation
      if (buf.size >= k && ord.lteq(buf.last, e)) buf
      else ((buf :+ e).sorted(ord)).take(k)
    }

    def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
      (a ++ b).sorted(ord).take(k)

    def finish(r: Seq[(String, Long)]): Seq[Long] = r.map(_._2)

    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** `minKByKey(k)(key, id)` — ids of the k smallest (key, id) pairs,
    * ascending. */
  def minKByKey(k: Int, key: Column, id: Column): Column =
    udaf(new MinKByKey(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(String, java.lang.Long)]())(
      key, id)
}
