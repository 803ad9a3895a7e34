package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.ArrayIntersect
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `|a ∩ b|` over two long arrays without materializing the
  * intersection: hash the smaller side, probe with the larger,
  * O(n+m) time and O(min) space. `array_intersect` + `size` instead
  * builds the full distinct-intersection ARRAY per row — wasted
  * allocation when only the cardinality is consumed, which is
  * exactly the shape of every set-similarity verification
  * (jaccard = inter / (|A|+|B|-inter)).
  *
  * Set semantics match array_intersect's exactly: duplicates count
  * once, and a null element present in BOTH arrays counts as one
  * shared element (array_intersect keeps it in the intersection).
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intersect_count expects two array<bigint>, got $other")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    IntersectCount.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    // static-call codegen: keeps the expression inside whole-stage
    // codegen spans without inlining the hash-set loop
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** The kernel (called from generated code — must stay public). */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[Long](small.numElements() * 2)
    var smallHasNull = false
    var i = 0
    while (i < small.numElements()) {
      if (small.isNullAt(i)) smallHasNull = true else set.add(small.getLong(i))
      i += 1
    }
    var n = 0
    i = 0
    while (i < big.numElements()) {
      // remove-on-hit so duplicates in `big` count once (set semantics);
      // a null shared by both sides counts once, like array_intersect
      if (big.isNullAt(i)) {
        if (smallHasNull) { n += 1; smallHasNull = false }
      } else if (set.remove(big.getLong(i))) n += 1
      i += 1
    }
    n
  }
}

/** Optimizer rule: `size(array_intersect(a, b))` over long arrays →
  * [[IntersectCount]]. Injected by [[graft.GraftExtensions]]; a
  * library user writes the idiomatic form and gets the cheap one.
  */
object RewriteIntersectCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false)
          if a.dataType.isInstanceOf[ArrayType] &&
            a.dataType.asInstanceOf[ArrayType].elementType == LongType &&
            b.dataType.isInstanceOf[ArrayType] &&
            b.dataType.asInstanceOf[ArrayType].elementType == LongType =>
        IntersectCount(a, b)
    }
}
