package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join split (enabled
  * in graft.Session) handles sort-merge skew at runtime; explicit
  * salting is the static alternative that also covers aggregations
  * and works when AQE cannot re-plan (e.g. inside streaming).
  */
object Skew {

  /** Salted equi-join of a skewed `left` against `right`:
    * left rows get a deterministic salt in [0, salts); right rows are
    * replicated once per salt; the join key becomes (key, salt), so a
    * hot key's rows spread over `salts` reducers instead of one.
    * Row-level results are identical to the unsalted join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
