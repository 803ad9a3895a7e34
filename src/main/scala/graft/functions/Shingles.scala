package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a (pre-normalized, single-spaced)
  * string, hashed to 64-bit longs — the native-codegen replacement
  * for the `transform(toks, xxhash64) |> transform(sequence, ...)`
  * higher-order-function pipeline, whose lambdas Spark evaluates
  * INTERPRETED (one boxed expression-tree walk per token per window;
  * profiled at ~15-20s per pass over sf0.1 documents, vs <1s here).
  *
  * One pass over the UTF-8 bytes: FNV-1a per token, then a
  * splitmix64-finalized sequential combine per k-window (order
  * sensitive, avalanched — MinHash permutations downstream need
  * uniformly distributed inputs), deduplicated with a single HashSet.
  * Semantics mirror [[graft.operators.Dedup.shingleExpr]]: fewer than
  * k tokens yields an empty array.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    Shingles.wordShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles.wordShingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object Shingles {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.IntegerType

  /** Builder for SQL registration: collapses the literal k argument
    * into the expression object at build time.
    */
  def build(children: Seq[Expression]): Expression = {
    val k = children(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"graft_shingles k must be an int literal, got $other")
    }
    WordShingles(children(0), k)
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val ShingleSeed = 0x9e3779b97f4a7c15L

  /** Reference implementation (specs compare the expression to this). */
  def wordShingles(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var tokCount = if (n == 0) 0 else 1
    var i = 0
    while (i < n) { if (b(i) == ' ') tokCount += 1; i += 1 }
    if (tokCount < k) return new GenericArrayData(Array.emptyLongArray)

    val th = new Array[Long](tokCount)
    var t = 0
    var h = FnvOffset
    i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') { th(t) = mix64(h); t += 1; h = FnvOffset }
      else h = (h ^ (b(i) & 0xffL)) * FnvPrime
      i += 1
    }

    val m = tokCount - k + 1
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var cnt = 0
    var w = 0
    while (w < m) {
      var c = ShingleSeed
      var j = 0
      while (j < k) { c = mix64(c ^ th(w + j)); j += 1 }
      if (seen.add(c)) { out(cnt) = c; cnt += 1 }
      w += 1
    }
    new GenericArrayData(
      if (cnt == m) out else java.util.Arrays.copyOf(out, cnt))
  }
}
