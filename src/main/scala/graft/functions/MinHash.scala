package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-permutation MinHash signature over an array of feature hashes.
  * Permutation p of feature h is `mix64(h ^ seed(p))` (splitmix64
  * finalizer — a bijective mixer, so each permutation is a uniform
  * relabeling of the feature space); the signature is the per-
  * permutation minimum.
  *
  * Native codegen expression: one |features| x 64 primitive loop. The
  * higher-order-function formulation costs 64 interpreted xxhash64
  * calls per feature with per-call allocation — ~50x slower measured
  * at sf0.1.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash expects array<bigint>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // null elements are skipped (same policy as SimHash64): a null
    // feature contributes nothing to the signature
    val feats = Array.newBuilder[Long]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) feats += arr.getLong(i)
      i += 1
    }
    new GenericArrayData(MinHashSig.sig(feats.result()))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      s"""
        long[] $mins = new long[64];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $i = 0; $i < $c.numElements(); $i++) {
          if ($c.isNullAt($i)) continue;
          long $h = $c.getLong($i);
          for (int $p = 0; $p < 64; $p++) {
            long $z = $h ^ (0x9E3779B97F4A7C15L * ($p + 1));
            $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
            $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
            $z = $z ^ ($z >>> 31);
            if ($z < $mins[$p]) $mins[$p] = $z;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Reference implementation for specs (must match doGenCode). */
  def sig(features: Array[Long]): Array[Long] = {
    val mins = Array.fill(64)(Long.MaxValue)
    for (h <- features; p <- 0 until 64) {
      var z = h ^ (0x9E3779B97F4A7C15L * (p + 1))
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if (z < mins(p)) mins(p) = z
    }
    mins
  }
}
