package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{Bloom, UniqUpTo}
import org.apache.spark.sql.functions._

/** Edge-case behavior of the round-3 surface: empty inputs, null
  * keys, degenerate series — the inputs a 100 TB pipeline WILL
  * contain somewhere.
  */
class EdgeSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  test("uniqUpTo ignores null inputs like count(DISTINCT)") {
    val df = Seq[(String, java.lang.Long)](
      ("g", 1L), ("g", null), ("g", 2L), ("g", null), ("g", 1L))
      .toDF("g", "x")
    val got = df.groupBy("g").agg(UniqUpTo(col("x"), 10).as("u"))
      .collect().head.getLong(1)
    val ref = df.groupBy("g").agg(countDistinct(col("x")).as("u"))
      .collect().head.getLong(1)
    assert(got === ref && got === 2L)
  }

  test("bloom filter from an empty build side matches nothing") {
    val bits = new Array[Byte](Bloom.M_BITS / 8)
    assert((1L to 1000L).forall(h => !Bloom.contains(bits, h)))
  }

  test("component labels over an empty pair graph are the identity") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val got = Dedup.componentLabels(pairs, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("gap fill over a single-point series yields exactly that point") {
    val one = Seq(("2024-01-01 10:00:00", 5L)).toDF("hs", "n")
      .select(col("hs").cast("timestamp").as("h"), col("n"))
    val cal = one.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val filled = cal.join(one, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("n")).collect()
    assert(filled.length === 1 && filled.head.getLong(1) === 5L)
  }

  test("schema-map quarantines every row when all rows are corrupt") {
    import graft.sources.SchemaMap
    import graft.sources.SchemaMap.FieldMap
    val bad = Seq(("x", "a"), ("y", "b")).toDF("k", "v")
    val mapped = SchemaMap(bad, Seq(
      FieldMap("k", "id", org.apache.spark.sql.types.LongType),
      FieldMap("v", "val", org.apache.spark.sql.types.StringType)))
    assert(mapped.good.count() === 0L)
    assert(mapped.bad.count() === 2L)
  }

  test("time travel: reading an uncommitted version fails loudly, not silently") {
    import graft.sources.TimeTravel
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_tt_edge"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    TimeTravel.commitAppend(Tables.nation(spark, sf), root): Unit
    intercept[Exception] { TimeTravel.readVersion(spark, root, 7).count() }
    // current version is still readable after the failed probe
    assert(TimeTravel.readLatest(spark, root).count() > 0)
  }

  test("dq: a single-rule check and an all-clean audit both behave") {
    import graft.sources.Dq
    val one = Dq.scanChecks(Tables.nation(spark, sf),
      Seq(Dq.rowRule("null_name", col("n_name").isNull)))
    val rows = one.collect()
    assert(rows.length === 1 && rows.head.getString(0) === "null_name" &&
      rows.head.getLong(1) === 0L)
    assert(Dq.passes(one))
  }

  test("interval join with a window smaller than any gap returns empty") {
    val e = Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("ts_us")).limit(3)
    val left = e.select(col("event_id").as("id_a"), col("ts_us").as("ta"))
      .withColumn("bin", explode(array(
        expr("ta div 1L - 1"), expr("ta div 1L"), expr("ta div 1L + 1"))))
    val right = e.select(col("event_id").as("id_b"), col("ts_us").as("tb"))
      .withColumn("bin", expr("tb div 1L"))
    val got = left.join(right, Seq("bin"))
      .filter(col("id_a") < col("id_b") && abs(col("ta") - col("tb")) <= 1L)
      .count()
    assert(got === 0L)
  }
}
