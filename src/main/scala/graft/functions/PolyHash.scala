package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint: h = Σ byte_i · B^(n-1-i)
  * over the UTF-8 bytes, in 64-bit wrapping arithmetic (Horner form).
  * This is the classic Rabin-Karp / polynomial rolling hash used for
  * document fingerprinting.
  *
  * Implemented as a native Catalyst expression WITH codegen — the
  * generated code is a tight primitive loop inside whole-stage
  * codegen, no boxing, no UDF serialization. This is the pattern for
  * any hot per-row kernel Spark lacks.
  */
case class PolyHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  final val Base = 1000003L // prime base, same as CPython's string hash base

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  // declared input types make graft_polyhash(<non-string>) a clean
  // analysis-time error (or an implicit cast) instead of a codegen
  // compile failure at runtime
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String].getBytes, Base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = $h * ${Base}L + (long)($bytes[$i] & 0xff);
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  /** Reference implementation (specs compare the expression to this). */
  def hash(bytes: Array[Byte], base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xff); i += 1 }
    h
  }
}

/** Registration of graft's native expressions into a session's
  * function registry, so they are callable from `expr(...)` / SQL.
  * Idempotent; `Session.local` calls it, and operators call it
  * defensively for externally-built sessions (e.g. the driver's).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val polyIdent = FunctionIdentifier("graft_polyhash")
    if (!registry.functionExists(polyIdent)) {
      registry.registerFunction(
        polyIdent,
        new ExpressionInfo(classOf[PolyHash64].getName, "graft_polyhash"),
        (children: Seq[Expression]) => PolyHash64(children.head))
    }
    val simIdent = FunctionIdentifier("graft_simhash")
    if (!registry.functionExists(simIdent)) {
      registry.registerFunction(
        simIdent,
        new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
        (children: Seq[Expression]) => SimHash64(children.head))
    }
    val mhIdent = FunctionIdentifier("graft_minhash")
    if (!registry.functionExists(mhIdent)) {
      registry.registerFunction(
        mhIdent,
        new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
        (children: Seq[Expression]) => MinHashSig(children.head))
    }
    val dotIdent = FunctionIdentifier("graft_dot")
    if (!registry.functionExists(dotIdent)) {
      registry.registerFunction(
        dotIdent,
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => DotProduct(children(0), children(1)))
    }
    val hllIdent = FunctionIdentifier("graft_hll_estimate")
    if (!registry.functionExists(hllIdent)) {
      registry.registerFunction(
        hllIdent,
        new ExpressionInfo(classOf[HllEstimate].getName, "graft_hll_estimate"),
        (children: Seq[Expression]) => HllEstimate(children.head))
    }
    val shinglesIdent = FunctionIdentifier("graft_shingles")
    if (!registry.functionExists(shinglesIdent)) {
      registry.registerFunction(
        shinglesIdent,
        new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
        (children: Seq[Expression]) => Shingles.build(children))
    }
    val cellsIdent = FunctionIdentifier("graft_cells")
    if (!registry.functionExists(cellsIdent)) {
      registry.registerFunction(
        cellsIdent,
        new ExpressionInfo(classOf[NearestCells].getName, "graft_cells"),
        (children: Seq[Expression]) => NearestCells.build(children))
    }
    val l2Ident = FunctionIdentifier("graft_l2norm")
    if (!registry.functionExists(l2Ident)) {
      registry.registerFunction(
        l2Ident,
        new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2norm"),
        (children: Seq[Expression]) => L2Normalize(children.head))
    }
    val pqIdent = FunctionIdentifier("graft_pq_encode")
    if (!registry.functionExists(pqIdent)) {
      registry.registerFunction(
        pqIdent,
        new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
        (children: Seq[Expression]) => PqEncode.build(children))
    }
    val srpIdent = FunctionIdentifier("graft_srp")
    if (!registry.functionExists(srpIdent)) {
      registry.registerFunction(
        srpIdent,
        new ExpressionInfo(classOf[SrpSignature].getName, "graft_srp"),
        (children: Seq[Expression]) => SrpSignature.build(children))
    }
    val bloomIdent = FunctionIdentifier("graft_bloom_contains")
    if (!registry.functionExists(bloomIdent)) {
      registry.registerFunction(
        bloomIdent,
        new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
        (children: Seq[Expression]) => BloomContains.build(children))
    }
    // CH-spelled SQL aliases (argMax, uniq, countIf, quantileTDigest,
    // ...) onto the same implementations — see functions/ChAliases
    ChAliases.register(spark)
    // optimizer rule for sessions built without GraftExtensions (the
    // driver's): experimental.extraOptimizations applies post-hoc
    if (!spark.experimental.extraOptimizations.contains(
        graft.plans.RewriteIntersectCount)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteIntersectCount
    }
    if (!spark.experimental.extraOptimizations.contains(
        graft.plans.ProjectionRoute)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ProjectionRoute
    }
  }
}
