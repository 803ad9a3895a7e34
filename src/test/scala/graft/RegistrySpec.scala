package graft

import org.apache.spark.sql.functions._

/** Every SURVEY §2 operator in the registry must run, be non-empty,
  * and (when oracled) expose exactly the column names its oracle SQL
  * produces — the driver's compare hashes by sorted column name.
  */
class RegistrySpec extends SparkSpec {

  for ((name, q) <- SparkEntry.registry.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("every oracled query has an oracle mentioning its output columns") {
    for ((name, q) <- SparkEntry.registry; sql <- q.oracle
         if !sql.contains("SELECT *")) {
      val cols = q.fn(spark, sf).columns
      val missing = cols.filterNot(c => sql.toLowerCase.contains(c.toLowerCase))
      assert(missing.isEmpty,
        s"$name: oracle SQL does not mention columns ${missing.mkString(",")}")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, q) <- SparkEntry.registry.toSeq.sortBy(_._1); bfn <- q.benchFn) {
    test(s"$name bench shape runs and returns rows at sf0.001") {
      // benchFn is what Bench actually measures — it must be as
      // runnable as the verify fn at every SF
      val df = bfn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name bench shape returned 0 rows")
    }
  }

  test("every oracled query emits only atomic (harness-portable) columns") {
    // The driver's pandas canonicalization sort_values-es every output
    // column; array/map/struct columns are unhashable there and turn a
    // correct answer into an ERR row (round-3 ch_arraydiff et al.).
    // Arrays must be string-joined (ch_grouparray's device) before the
    // result leaves the query.
    import org.apache.spark.sql.types._
    for ((name, q) <- SparkEntry.registry if q.oracle.isDefined) {
      val bad = q.fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${f.name}:${f.dataType.simpleString}"
      }
      assert(bad.isEmpty, s"$name emits non-atomic columns: ${bad.mkString(", ")}")
    }
  }

  test("ch_uniq_hll approximation is within 5% of exact") {
    val rows = SparkEntry.registry("ch_uniq_hll").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Boolean]("hll_within_5pct"),
        s"${r.get(0)}: HLL estimate drifts >5% from ${r.get(1)}")
  }
}
