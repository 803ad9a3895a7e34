package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r14 table-resolution memoization: repeated loads of the
  * same (session, dir, table) reuse the SAME analyzed DataFrame (no
  * re-listing, no footer re-read), while different dirs and different
  * tables stay distinct — and the memo never caches data: the frame
  * still scans the parquet files on every action.
  */
class TablesMemoSpec extends AnyFunSuite {

  private lazy val spark = Session.local(2)
  private val sf = "/root/testdata/sf0.001"

  test("same (dir, table) returns the memoized DataFrame instance") {
    val a = Tables.load(spark, sf, "orders")
    val b = Tables.load(spark, sf, "orders")
    assert(a eq b, "second load must reuse the resolved relation")
  }

  test("different tables and different dirs do not collide") {
    val o = Tables.load(spark, sf, "orders")
    val l = Tables.load(spark, sf, "lineitem")
    assert(!(o eq l))
    val o2 = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    assert(!(o eq o2), "memo key must include the corpus dir")
  }

  test("memoized frame computes from parquet on every action") {
    val n1 = Tables.load(spark, sf, "orders").count()
    val n2 = Tables.load(spark, sf, "orders").count()
    assert(n1 == n2 && n1 > 0)
  }

  test("events loader still derives ts_us/ts through the memo") {
    val e = Tables.events(spark, sf)
    assert(e.columns.contains("ts_us") && e.columns.contains("ts"))
    assert(e.limit(1).count() == 1)
  }
}
