package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over an array of feature hashes: bit i of the
  * signature is the sign of Σ_features (±1 by the feature hash's bit
  * i). Near-identical feature sets → near-identical signatures
  * (small hamming distance).
  *
  * Native Catalyst expression with codegen: the |features| x 64 loop
  * runs as primitive longs inside whole-stage codegen. A
  * higher-order-function formulation needs a nested lambda capturing
  * the outer bit index, which Spark's HOF binding does not support
  * reliably — and would box every step besides.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash expects array<bigint>, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
        int[] $counts = new int[64];
        for (int $i = 0; $i < $c.numElements(); $i++) {
          if (!$c.isNullAt($i)) {
            long $h = $c.getLong($i);
            for (int $b = 0; $b < 64; $b++) {
              if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
            }
          }
        }
        long $sig = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($counts[$b] > 0) $sig |= (1L << $b);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Reference implementation for specs. */
  def hash(features: Seq[Long]): Long = {
    val counts = new Array[Int](64)
    for (h <- features; b <- 0 until 64)
      if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
    (0 until 64).foldLeft(0L)((s, b) => if (counts(b) > 0) s | (1L << b) else s)
  }
}
