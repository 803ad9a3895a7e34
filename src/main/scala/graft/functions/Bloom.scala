package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** Deterministic Bloom filter over 64-bit keys — the build side of a
  * bloom-prefiltered join: aggregate the (small) dimension's keys
  * into an m-bit filter map-side, OR the partial filters together
  * (commutative + associative, so partial aggregation and AQE
  * re-partitioning cannot change the result), broadcast the bytes,
  * and prefilter the fact side BEFORE its shuffle. False positives
  * only — the exact join afterwards removes them — so the composed
  * result is exact while the shuffle carries only rows that can
  * match (the runtime-filter idea CH/Spark apply internally,
  * expressed as an explicit, testable operator).
  *
  * k hash probes are derived from one xxhash64 value by the standard
  * double-hashing construction h1 + i*h2 (Kirsch & Mitzenmacher,
  * "Less hashing, same performance"), so build and probe stay pure
  * integer arithmetic — fully deterministic across engines and runs.
  */
object Bloom {

  /** m bits (power of two), k probes. 64 KiB / k=5 ≈ 0.1% fp at 50k
    * keys — plenty for a broadcastable dimension filter.
    */
  val M_BITS: Int = 1 << 19
  val K: Int = 5

  @inline private def mix(h: Long, i: Int): Int = {
    val h2 = (h >>> 32) | 1L // odd second hash
    (((h + i * h2) & Long.MaxValue) % M_BITS).toInt
  }

  def set(bits: Array[Byte], h: Long): Unit = {
    var i = 0
    while (i < K) {
      val b = mix(h, i)
      bits(b >> 3) = (bits(b >> 3) | (1 << (b & 7))).toByte
      i += 1
    }
  }

  def contains(bits: Array[Byte], h: Long): Boolean = {
    var i = 0
    while (i < K) {
      val b = mix(h, i)
      if ((bits(b >> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  final class BuildAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](M_BITS / 8)
    def reduce(buf: Array[Byte], h: Long): Array[Byte] = { set(buf, h); buf }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
  }

  /** Aggregate a key column into filter bytes (hash first: the
    * filter always sees xxhash64(key), never raw values).
    */
  def build(key: Column): Column = udaf(new BuildAgg, Encoders.scalaLong)(xxhash64(key))
}

/** Native probe expression: `BloomContains(bits)(xxhash64(key))` — the
  * filter bytes ride into generated code via `addReferenceObj` (one
  * shared array per task, NOT a 64 KiB literal re-walked by every
  * Catalyst pass — same rationale as NearestCells), and the k-probe
  * loop inlines into whole-stage codegen.
  */
case class BloomContains(child: org.apache.spark.sql.catalyst.expressions.Expression,
    bits: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    Bloom.contains(bits, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bloom.contains($ref, $c)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.types.BinaryType

  /** Builder for SQL/call_function registration: collapses the
    * literal filter-bytes argument into the expression object at
    * build time (the NearestCells pattern — a 64 KiB literal child
    * would be re-walked by every Catalyst pass).
    */
  def build(children: Seq[Expression]): Expression = children(1) match {
    case Literal(b: Array[Byte], BinaryType) => BloomContains(children(0), b)
    case other => throw new IllegalArgumentException(
      s"graft_bloom_contains filter must be a literal binary, got $other")
  }
}
