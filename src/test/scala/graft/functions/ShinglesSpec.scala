package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the native shingler against a straightforward
  * Scala reference: same shingle COUNT as the distinct string k-grams
  * (64-bit collisions are ignorable at these sizes), deduplication,
  * short-input behavior, and determinism.
  */
class ShinglesSpec extends AnyFunSuite {

  private def refCount(text: String, k: Int): Int = {
    val toks = text.split(" ", -1)
    if (toks.length < k) 0
    else toks.sliding(k).map(_.mkString(" ")).toSet.size
  }

  private def native(text: String, k: Int): Array[Long] =
    Shingles.wordShingles(UTF8String.fromString(text), k).toLongArray()

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  // normalized input domain: single-space-joined tokens (docShingles
  // applies normText before the expression)
  private val doc: Gen[String] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("shingle count equals distinct string k-gram count") {
    holds(Prop.forAll(doc, Gen.chooseNum(1, 5)) { (text, k) =>
      native(text, k).length == refCount(text, k)
    })
  }

  test("output contains no duplicates and is deterministic") {
    holds(Prop.forAll(doc) { text =>
      val a = native(text, 3)
      a.distinct.length == a.length && java.util.Arrays.equals(a, native(text, 3))
    })
  }

  test("fewer than k tokens yields an empty array") {
    assert(native("one two", 3).isEmpty)
    // empty text is ZERO tokens (split() would call it one empty
    // token; the shingler's contract is "no content, no shingles")
    assert(native("", 1).isEmpty)
    assert(native("a b c", 3).length == 1)
  }

  test("repeated k-grams collapse to one shingle") {
    assert(native("a b a b a b", 2).length == 2) // "a b", "b a"
  }
}
