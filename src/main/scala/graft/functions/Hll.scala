package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog with EXPLICIT, MERGEABLE register state — the CH
  * `AggregateFunction(uniq, ...)` column: a materialized view keeps
  * the state per group, every ingest batch aggregates its own state,
  * and batch states MERGE (elementwise register max) into exactly the
  * state a single pass over the union would produce. Spark's built-in
  * approx_count_distinct computes a one-shot estimate and cannot
  * persist or merge its state across jobs, which is the whole point
  * of incremental view maintenance.
  *
  * Standard public construction (Flajolet et al. 2007, HLL++ linear
  * counting for the low range): p=12 -> 4096 byte registers, ~1.6%
  * relative error. add() takes a 64-bit hash; register index = low p
  * bits, rank = leading-zeros-of-remaining-bits + 1.
  */
object Hll {
  val P: Int = 12
  val M: Int = 1 << P // 4096 registers

  def emptyState: Array[Byte] = new Array[Byte](M)

  def add(state: Array[Byte], hash: Long): Array[Byte] = {
    val idx = (hash & (M - 1)).toInt
    val w = hash >>> P
    // rank over the remaining 52 bits; w==0 -> max rank
    val rank = (if (w == 0L) 64 - P else java.lang.Long.numberOfTrailingZeros(w)) + 1
    if (rank > state(idx)) state(idx) = rank.toByte
    state
  }

  /** Elementwise max — associative, commutative, idempotent: batch
    * states merge in any order/grouping to the one-pass state.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Bias-corrected estimate with linear counting for the low range.
    * The state MUST be exactly M register bytes: a short array would
    * throw mid-loop, a long one would silently estimate from a prefix.
    */
  def estimate(state: Array[Byte]): Long = {
    require(state.length == M,
      s"HLL state must be $M bytes, got ${state.length}")
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += 1.0 / (1L << (state(i) & 0xff)).toDouble
      if (state(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * M * M / invSum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }

  /** Aggregator: 64-bit hashes -> HLL register state. */
  final class StateAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = emptyState
    def reduce(b: Array[Byte], h: Long): Array[Byte] = add(b, h)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregator: previously-saved states -> merged state. */
  final class MergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = emptyState
    def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] = Hll.merge(b, s)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `hll_state(xxhash64(col))` — build a state column. */
  def state(hashes: Column): Column = udaf(new StateAgg, Encoders.scalaLong)(hashes)

  /** `hll_merge(state)` — merge saved states. */
  def mergeStates(states: Column): Column =
    udaf(new MergeAgg, Encoders.BINARY)(states)
}

/** Estimate of an HLL state column, as a native expression (the state
  * is bytes on the wire; the estimate is a scalar read of it).
  */
case class HllEstimate(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  import org.apache.spark.sql.types._
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Hll.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hll.estimate($c);")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): HllEstimate =
    copy(child = newChild)
}
