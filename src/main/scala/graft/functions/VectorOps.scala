package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double-array columns as a native codegen
  * expression: one primitive loop, no per-element boxing, no lambda
  * dispatch. The `zip_with` + `aggregate` higher-order-function
  * formulation evaluates its lambdas INTERPRETED (Spark does not
  * codegen HOFs) and allocates an intermediate array per row — at
  * millions of candidate pairs that is the dominant cost of every
  * embedding operator. This expression keeps the whole similarity
  * kernel inside whole-stage codegen.
  *
  * Float inputs arrive via an implicit array<float> -> array<double>
  * cast, so accumulation order and precision match the previous
  * double-cast HOF formulation bit-for-bit.
  *
  * Null elements contribute nothing (same policy as SimHash64 /
  * MinHashSig); arrays of different lengths pair up to the shorter.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  // Seq[DataType] (covariant) because AbstractDataType is private[sql]
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $acc += $a.getDouble($i) * $b.getDouble($i);
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
