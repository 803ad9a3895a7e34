package graft.sources

import graft.SparkSpec
import graft.sources.SchemaMap.{Default, FieldMap, Nullify}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaMapSpec extends SparkSpec {

  private def loose = {
    import graft.SparkSpec.spark.implicits._
    Seq(
      ("1", "alice", "10.5"),   // clean
      ("2", "bob", null),       // null source: legitimate null, not a failure
      ("x", "carol", "3.25"),   // bad id
      ("4", "dave", "oops")     // bad balance
    ).toDF("id", "name", "bal")
  }

  test("strict failures go to the bad channel with a self-describing reason") {
    val m = SchemaMap(loose, Seq(
      FieldMap("id", "user_id", LongType),
      FieldMap("name", "user_name", StringType),
      FieldMap("bal", "balance", DoubleType)))
    val good = m.good.orderBy("user_id").collect()
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(good(1).isNullAt(2), "null source must stay a legitimate null")
    val bad = m.bad.orderBy("id").collect()
    assert(bad.length == 2)
    val reasons = bad.map(r => r.getString(r.fieldIndex("bad_reason"))).toSeq
    assert(reasons.exists(_.contains("id !~ bigint")))
    assert(reasons.exists(_.contains("bal !~ double")))
  }

  test("Nullify coerces failures to NULL and keeps the row") {
    val m = SchemaMap(loose, Seq(
      FieldMap("id", "user_id", LongType, Nullify),
      FieldMap("bal", "balance", DoubleType, Nullify)))
    assert(m.bad.count() == 0)
    val rows = m.good.collect()
    assert(rows.length == 4)
    assert(rows.count(_.isNullAt(0)) == 1) // the "x" id
    assert(rows.count(_.isNullAt(1)) == 2) // null source + "oops"
  }

  test("Default substitutes the fallback on cast failure; legit NULL stays NULL") {
    val m = SchemaMap(loose, Seq(
      FieldMap("id", "user_id", LongType, Nullify),
      FieldMap("bal", "balance", DoubleType, Default(0.0))))
    val rows = m.good.select("balance").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // "oops" (cast failure) -> 0.0; the null-source row stays null
    assert(rows.flatten.sorted.toSeq == Seq(0.0, 3.25, 10.5))
    assert(rows.count(_.isEmpty) == 1)
  }

  test("target schema has mapped names, order, and types") {
    val m = SchemaMap(loose, Seq(
      FieldMap("bal", "balance", DoubleType, Nullify),
      FieldMap("id", "user_id", IntegerType, Nullify)))
    assert(m.good.schema.map(f => (f.name, f.dataType)) ==
      Seq("balance" -> DoubleType, "user_id" -> IntegerType))
  }
}
