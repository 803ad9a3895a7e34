package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the mergeable sketch states, property-tested
  * driver-side (no Spark): distributed partial aggregation is only
  * correct if merge is a commutative, associative monoid operation
  * with zero as identity — the exact property Spark's partial/final
  * aggregation and AQE re-partitioning rely on, under ANY task split.
  */
class SketchLawsSpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val xs: Gen[List[Long]] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-500L, 500L)))

  // --------------------------------------------------------------- KMV
  private val kmv = new Kmv.Agg(64)
  private def kstate(v: Seq[Long]): Array[Byte] =
    v.foldLeft(kmv.zero)((b, x) => kmv.reduce(b, Long.box(x)))

  test("kmv merge is commutative, associative, with zero identity") {
    holds(Prop.forAll(xs, xs, xs) { (a, b, c) =>
      val (sa, sb, sc) = (kstate(a), kstate(b), kstate(c))
      java.util.Arrays.equals(kmv.merge(sa, sb), kmv.merge(sb, sa)) &&
      java.util.Arrays.equals(
        kmv.merge(kmv.merge(sa, sb), sc), kmv.merge(sa, kmv.merge(sb, sc))) &&
      java.util.Arrays.equals(kmv.merge(sa, kmv.zero), sa)
    })
  }

  test("kmv split-invariance: any partition of the input merges to the same state") {
    holds(Prop.forAll(xs, Gen.chooseNum(0, 400)) { (a, cut0) =>
      val cut = if (a.isEmpty) 0 else cut0 % (a.length + 1)
      val (l, r) = a.splitAt(cut)
      java.util.Arrays.equals(kmv.merge(kstate(l), kstate(r)), kstate(a))
    })
  }

  test("kmv is exact below k for any input multiset") {
    holds(Prop.forAll(xs) { a =>
      val distinct = a.distinct.length
      distinct >= 64 || kmv.finish(kstate(a)) == distinct.toLong
    })
  }

  // ---------------------------------------------------------- uniqUpTo
  private val upto = new UniqUpTo.Agg(16)
  private def ustate(v: Seq[Long]): Array[Byte] =
    v.foldLeft(upto.zero)((b, x) => upto.reduce(b, Long.box(x)))

  test("uniqUpTo merge laws hold through saturation") {
    holds(Prop.forAll(xs, xs) { (a, b) =>
      val (sa, sb) = (ustate(a), ustate(b))
      val m = upto.merge(sa, sb)
      val distinct = (a ++ b).distinct.length
      val expect = if (distinct <= 16) distinct.toLong else 17L
      upto.finish(m) == expect &&
      upto.finish(upto.merge(sb, sa)) == expect &&
      java.util.Arrays.equals(upto.merge(sa, upto.zero), sa)
    })
  }

  // ---------------------------------------------------------------- HLL
  test("hll merge is commutative and split-invariant on the estimate") {
    holds(Prop.forAll(xs, xs) { (a, b) =>
      def st(v: Seq[Long]): Array[Byte] = {
        val agg = new Hll.StateAgg
        // hash inputs like the operators do (xxhash64-distributed);
        // a cheap spread hash suffices for the law check
        v.foldLeft(agg.zero)((s, x) => agg.reduce(s, x * -7046029254386353131L))
      }
      val agg = new Hll.MergeAgg
      Hll.estimate(agg.reduce(agg.zero, st(a ++ b))) ==
        Hll.estimate(agg.merge(agg.reduce(agg.zero, st(a)),
          agg.reduce(agg.zero, st(b))))
    })
  }
}
