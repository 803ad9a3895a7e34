package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key for multi-dimensional data
  * skipping: interleaving the bits of two sort keys makes a single
  * linear order in which BOTH dimensions are locally contiguous, so
  * parquet row-group min/max stats prune box predicates on either or
  * both columns — the layout trick behind Delta/Iceberg OPTIMIZE
  * ZORDER, built here from plain codegen-friendly bitwise columns.
  */
object Zorder {

  /** Spread the low 16 bits of `c` onto the even bit positions of a
    * 32-bit lane (the classic parallel-prefix morton dilation).
    */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: a.bit(i) -> position 2i,
    * b.bit(i) -> position 2i+1.
    */
  def interleave(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
