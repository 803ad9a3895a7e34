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

/** The `k` nearest centroids of a vector, as array<struct<d,cell>>
  * ascending by (squared distance, cell id).
  *
  * The centroid matrix lives INSIDE the expression object (surfaced
  * to generated code via `addReferenceObj`), not as a literal child:
  * a typedLit(cells x dim doubles) subtree repeated per call made
  * Catalyst re-walk hundreds of literal nodes on every analyzer /
  * optimizer pass — for the IVF operators that planning time was 3x
  * the actual execution. SQL callers pass the centroids as a literal
  * (`graft_cells(nv, <literal>, k)`) and the registered builder
  * collapses it into the object at build time, so the plan keeps a
  * single-child unary node.
  *
  * Distance accumulates coordinate-wise in index order — bit-for-bit
  * the order the previous zip_with/aggregate formulation used, so
  * cell assignments are unchanged.
  */
case class NearestCells(child: Expression, cents: Array[Array[Double]], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  import org.apache.spark.sql.types._

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false))),
    containsNull = false)

  private def kEff: Int = math.min(k, cents.length)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val bestD = Array.fill(kEff)(Double.MaxValue)
    val bestC = Array.fill(kEff)(-1)
    var ci = 0
    while (ci < cents.length) {
      val cent = cents(ci)
      var acc = 0.0
      val dim = math.min(cent.length, v.numElements())
      var i = 0
      while (i < dim) {
        if (!v.isNullAt(i)) { val diff = cent(i) - v.getDouble(i); acc += diff * diff }
        i += 1
      }
      // strict < keeps the earlier (smaller) cell id on ties
      var p = 0
      var placed = false
      while (p < kEff && !placed) {
        if (acc < bestD(p)) {
          var q = kEff - 1
          while (q > p) { bestD(q) = bestD(q - 1); bestC(q) = bestC(q - 1); q -= 1 }
          bestD(p) = acc; bestC(p) = ci
          placed = true
        }
        p += 1
      }
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](kEff)(p =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](bestD(p), bestC(p)))))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val bd = ctx.freshName("bestD")
      val bc = ctx.freshName("bestC")
      val ci = ctx.freshName("ci")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val acc = ctx.freshName("acc")
      val dim = ctx.freshName("dim")
      val cent = ctx.freshName("cent")
      val rows = ctx.freshName("rows")
      val placed = ctx.freshName("placed")
      s"""
        double[] $bd = new double[$kEff];
        int[] $bc = new int[$kEff];
        java.util.Arrays.fill($bd, Double.MAX_VALUE);
        for (int $ci = 0; $ci < $centsRef.length; $ci++) {
          double[] $cent = $centsRef[$ci];
          double $acc = 0.0;
          int $dim = java.lang.Math.min($cent.length, $c.numElements());
          for (int $i = 0; $i < $dim; $i++) {
            if (!$c.isNullAt($i)) {
              double ${i}_diff = $cent[$i] - $c.getDouble($i);
              $acc += ${i}_diff * ${i}_diff;
            }
          }
          boolean $placed = false;
          for (int $p = 0; $p < $kEff && !$placed; $p++) {
            if ($acc < $bd[$p]) {
              for (int $q = $kEff - 1; $q > $p; $q--) {
                $bd[$q] = $bd[$q - 1]; $bc[$q] = $bc[$q - 1];
              }
              $bd[$p] = $acc; $bc[$p] = $ci;
              $placed = true;
            }
          }
        }
        Object[] $rows = new Object[$kEff];
        for (int $p = 0; $p < $kEff; $p++) {
          $rows[$p] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            new Object[]{$bd[$p], $bc[$p]});
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** L2 normalization of a double-array column as ONE native codegen
  * expression. The HOF formulation (`aggregate` for the norm +
  * `transform` for the divide) runs both lambdas INTERPRETED at ~2
  * boxed dispatches per element — materializing a 20k x 256 corpus'
  * normalized vectors cost 21 s (measured; ~1 ms/row), which
  * dominated the first timed run of every embedding bench. This
  * expression is the same arithmetic in one primitive loop.
  *
  * BIT-EXACT parity with the HOF (load-bearing — every embedding
  * oracle's nvPrelude replays this fold in DuckDB): the norm is the
  * 0.0-seeded sum of x*x in index order, sqrt is correctly-rounded
  * IEEE, each output is x / norm. Null-element semantics match the
  * HOF too: a null element nulls the accumulated norm (acc + null),
  * so EVERY output element becomes null (x / null); a null x stays
  * null regardless.
  */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  import org.apache.spark.sql.types._

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var acc = 0.0
    var anyNull = false
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true
      else { val x = v.getDouble(i); acc += x * x }
      i += 1
    }
    val out = new Array[Any](n)
    if (!anyNull) {
      val nrm = math.sqrt(acc)
      i = 0
      while (i < n) { out(i) = v.getDouble(i) / nrm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val anyNull = ctx.freshName("anyNull")
      val out = ctx.freshName("out")
      val nrm = ctx.freshName("nrm")
      s"""
        int $n = $c.numElements();
        double $acc = 0.0;
        boolean $anyNull = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($c.isNullAt($i)) { $anyNull = true; }
          else { double ${i}_x = $c.getDouble($i); $acc += ${i}_x * ${i}_x; }
        }
        Object[] $out = new Object[$n];
        if (!$anyNull) {
          double $nrm = java.lang.Math.sqrt($acc);
          for (int $i = 0; $i < $n; $i++) {
            $out[$i] = (Object) ($c.getDouble($i) / $nrm);
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** Product-quantization encode of a normalized vector: array<int> of
  * m codeword ids, code[sub] = argmin over the sub-th codebook of the
  * squared distance to the sub-th length-`subLen` slice of the
  * vector. ONE compact codegen node for the whole encode — the
  * previous formulation (an `array()` of m separate graft_cells
  * calls over `slice()`s, posexploded) allocated m slices per row and
  * pushed 32 expression trees into one codegen stage, which measured
  * 15 s for a 20k x 256 corpus; this loop is the same arithmetic
  * fused.
  *
  * BIT-EXACT parity with that formulation (load-bearing — the seeded
  * oracle replays the encode in DuckDB): distance accumulates
  * coordinate-wise in index order from a 0.0 seed, null elements
  * contribute nothing, a vector shorter than (sub+1)*subLen pairs up
  * to its length, and ties keep the smaller codeword id (strict <).
  * Codebooks ride inside the expression object (addReferenceObj, the
  * [[NearestCells]] device) as books[sub][code][i].
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]],
    subLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  import org.apache.spark.sql.types._

  require(subLen >= 1, s"subLen must be positive, got $subLen")
  require(books.nonEmpty && books.forall(_.nonEmpty),
    "PqEncode needs at least one codebook with at least one codeword")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = books.length
    val out = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      val book = books(sub)
      val base = sub * subLen
      var bestD = Double.MaxValue
      var bestC = -1
      var cw = 0
      while (cw < book.length) {
        val cent = book(cw)
        val dim = math.min(cent.length, math.max(0, n - base))
        var acc = 0.0
        var i = 0
        while (i < dim) {
          if (!v.isNullAt(base + i)) {
            val diff = cent(i) - v.getDouble(base + i); acc += diff * diff
          }
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestC = cw }
        cw += 1
      }
      out(sub) = bestC
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val sub = ctx.freshName("sub")
      val book = ctx.freshName("book")
      val base = ctx.freshName("base")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val cw = ctx.freshName("cw")
      val cent = ctx.freshName("cent")
      val dim = ctx.freshName("dim")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        int $n = $c.numElements();
        Object[] $out = new Object[$booksRef.length];
        for (int $sub = 0; $sub < $booksRef.length; $sub++) {
          double[][] $book = $booksRef[$sub];
          int $base = $sub * $subLen;
          double $bestD = Double.MAX_VALUE;
          int $bestC = -1;
          for (int $cw = 0; $cw < $book.length; $cw++) {
            double[] $cent = $book[$cw];
            int $dim = java.lang.Math.min($cent.length,
              java.lang.Math.max(0, $n - $base));
            double $acc = 0.0;
            for (int $i = 0; $i < $dim; $i++) {
              if (!$c.isNullAt($base + $i)) {
                double ${i}_diff = $cent[$i] - $c.getDouble($base + $i);
                $acc += ${i}_diff * ${i}_diff;
              }
            }
            if ($acc < $bestD) { $bestD = $acc; $bestC = $cw; }
          }
          $out[$sub] = (Object) $bestC;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types._

  /** Builder for `graft_pq_encode(vec, <literal books>, <literal
    * subLen>)`: collapses the literal 3-d codebook tensor into the
    * expression object at build time (the [[NearestCells.build]]
    * device — a m x ks x subLen literal subtree would dominate
    * Catalyst analysis).
    */
  def build(children: Seq[Expression]): Expression = {
    val books = children(1) match {
      case Literal(ad: ArrayData,
          ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        ad.toArray[ArrayData](ArrayType(ArrayType(DoubleType)))
          .map(_.toArray[ArrayData](ArrayType(DoubleType))
            .map(_.toDoubleArray()))
      case other => throw new IllegalArgumentException(
        s"graft_pq_encode books must be a literal array^3<double>, got $other")
    }
    val subLen = children(2) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"graft_pq_encode subLen must be an int literal, got $other")
    }
    PqEncode(children(0), books, subLen)
  }
}

/** Banded sign-random-projection (SRP) signature of a double-array
  * vector: one long per band, bit r of band b = sign(v . planes[b*rpb
  * + r]). SRP is the LSH family for COSINE similarity (collision
  * probability of one bit = 1 - angle/pi), so banding the bits gives
  * the same candidate-generation contract MinHash gives Jaccard:
  * pairs above the similarity target collide in >=1 band w.h.p.,
  * random pairs almost never do. This is the scale path for high-dim
  * embedding near-dup where METRIC pruning (IVF ball bounds) is
  * geometry-dead: at dim>=256 a 0.45-cosine threshold is distance
  * ~1.05 on the unit sphere while KMeans cell radii on
  * noise-dominated data are ~1 — triangle-inequality admissibility
  * rejects nothing and the candidate join degenerates to all pairs
  * (measured: the dim-256 sf10 corpus spilled >60 GB through the IVF
  * path; the SRP path bounds candidates by planted-pair density).
  *
  * The projection planes ride inside the expression object
  * (addReferenceObj) exactly like [[NearestCells]] — a bits x dim
  * literal subtree would dominate Catalyst analysis time. Null
  * elements contribute nothing; rowsPerBand <= 64.
  */
case class SrpSignature(child: Expression, planes: Array[Array[Double]],
    rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  import org.apache.spark.sql.types.LongType

  require(rowsPerBand >= 1 && rowsPerBand <= 64,
    s"rowsPerBand must be in [1, 64], got $rowsPerBand")
  require(planes.length % rowsPerBand == 0,
    s"planes (${planes.length}) must be a whole number of bands of $rowsPerBand")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def bands: Int = planes.length / rowsPerBand

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        val plane = planes(b * rowsPerBand + r)
        var acc = 0.0
        val dim = math.min(plane.length, v.numElements())
        var i = 0
        while (i < dim) {
          if (!v.isNullAt(i)) acc += plane(i) * v.getDouble(i)
          i += 1
        }
        if (acc >= 0.0) sig |= (1L << r)
        r += 1
      }
      out(b) = sig
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val sig = ctx.freshName("sig")
      val acc = ctx.freshName("acc")
      val dim = ctx.freshName("dim")
      val plane = ctx.freshName("plane")
      s"""
        Object[] $out = new Object[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $sig = 0L;
          for (int $r = 0; $r < $rowsPerBand; $r++) {
            double[] $plane = $planesRef[$b * $rowsPerBand + $r];
            double $acc = 0.0;
            int $dim = java.lang.Math.min($plane.length, $c.numElements());
            for (int $i = 0; $i < $dim; $i++) {
              if (!$c.isNullAt($i)) $acc += $plane[$i] * $c.getDouble($i);
            }
            if ($acc >= 0.0) $sig |= (1L << $r);
          }
          $out[$b] = $sig;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types._

  /** Builder for `graft_srp(vec, <literal planes>, <literal rpb>)`:
    * collapses the literal plane matrix into the expression object at
    * build time (the [[NearestCells.build]] device).
    */
  def build(children: Seq[Expression]): Expression = {
    val planes = children(1) match {
      case Literal(ad: ArrayData, ArrayType(ArrayType(DoubleType, _), _)) =>
        ad.toArray[ArrayData](ArrayType(DoubleType)).map(_.toDoubleArray())
      case other => throw new IllegalArgumentException(
        s"graft_srp planes must be a literal array<array<double>>, got $other")
    }
    val rpb = children(2) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"graft_srp rowsPerBand must be an int literal, got $other")
    }
    SrpSignature(children(0), planes, rpb)
  }
}

object NearestCells {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types._

  /** Builder for SQL/call_function registration: collapses the literal
    * centroid argument into the expression object at build time.
    */
  def build(children: Seq[Expression]): Expression = {
    val cents = children(1) match {
      case Literal(ad: ArrayData, ArrayType(ArrayType(DoubleType, _), _)) =>
        ad.toArray[ArrayData](ArrayType(DoubleType)).map(_.toDoubleArray())
      case other => throw new IllegalArgumentException(
        s"graft_cells centroids must be a literal array<array<double>>, got $other")
    }
    val k = children(2) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"graft_cells k must be an int literal, got $other")
    }
    NearestCells(children(0), cents, k)
  }
}
