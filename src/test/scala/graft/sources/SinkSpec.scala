package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SinkSpec extends SparkSpec {

  private def freshRoot(tag: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sinkspec_$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  test("sink retries through transient backend failures without data loss") {
    val root = freshRoot("flaky")
    Sink.FlakyBackend.counter.set(0)
    val backend = new Sink.FlakyBackend(new Sink.LocalBackend(root), failures = 3)
    val df = Tables.nation(spark, sf)
    Sink.write(df, Sink.SinkConfig(root, "nation", batchSize = 7), backend)
    val readBack = spark.read.json(s"$root/nation")
    assert(readBack.count() == df.count(),
      "rows lost or duplicated through the retry path")
    assert(Sink.FlakyBackend.counter.get() > 3, "injected failures never hit")
  }

  test("sink aborts when failures exceed maxRetries") {
    val root = freshRoot("fatal")
    Sink.FlakyBackend.counter.set(0)
    val backend = new Sink.FlakyBackend(new Sink.LocalBackend(root), failures = 1000)
    val df = Tables.region(spark, sf).coalesce(1)
    val e = intercept[Exception] {
      Sink.write(df, Sink.SinkConfig(root, "region", maxRetries = 2), backend)
    }
    assert(e.getMessage != null)
  }

  test("replaying a batch key overwrites instead of appending") {
    val root = freshRoot("replay")
    val backend = new Sink.LocalBackend(root)
    backend.insertBatch("t", "p00000-b00000", Seq("""{"x":1}""", """{"x":2}"""))
    backend.insertBatch("t", "p00000-b00000", Seq("""{"x":9}"""))
    val content = Files.readString(Paths.get(s"$root/t/p00000-b00000.jsonl"))
    assert(content.trim == """{"x":9}""")
  }

  // ---------------------------------------------------------------- JDBC

  private def derbyUrl(tag: String): String =
    s"jdbc:derby:${freshRoot(s"derby_$tag")}/db;create=true"

  private def jdbcCount(url: String, table: String): Long = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT count(*) FROM $table")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("JDBC sink retries through transient failures without data loss") {
    val url = derbyUrl("flaky")
    Sink.FlakyBackend.counter.set(0)
    val backend = new Sink.FlakyTypedBackend(new JdbcBackend(url), failures = 3)
    val df = Tables.nation(spark, sf)
    Sink.writeTyped(df, Sink.SinkConfig("", "nation", batchSize = 7), backend)
    assert(jdbcCount(url, "nation") == df.count(),
      "rows lost or duplicated through the JDBC retry path")
    assert(Sink.FlakyBackend.counter.get() > 3, "injected failures never hit")
  }

  test("JDBC sink aborts when failures exceed maxRetries") {
    val url = derbyUrl("fatal")
    Sink.FlakyBackend.counter.set(0)
    val backend = new Sink.FlakyTypedBackend(new JdbcBackend(url), failures = 1000)
    val df = Tables.region(spark, sf).coalesce(1)
    val e = intercept[Exception] {
      Sink.writeTyped(df, Sink.SinkConfig("", "region", maxRetries = 2), backend)
    }
    assert(e.getMessage != null)
  }

  test("JDBC replaying a batch key transactionally overwrites") {
    import org.apache.spark.sql.types._
    val url = derbyUrl("replay")
    val backend = new JdbcBackend(url)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def row(id: Long, v: String) = org.apache.spark.sql.Row(id, v)
    backend.insertBatch("t", "p00000-b00000", schema,
      Seq(row(1, "a"), row(2, "b")))
    backend.insertBatch("t", "p00001-b00000", schema, Seq(row(3, "c")))
    // Replay of the first key with different content replaces only it.
    backend.insertBatch("t", "p00000-b00000", schema, Seq(row(9, "z")))
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT id FROM t ORDER BY id")
      val ids = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getLong(1)).toList
      assert(ids == List(3L, 9L))
    } finally c.close()
  }

  test("approx profile: NDV certificate true, and no Expand in the plan") {
    val approxDf = graft.SparkEntry.registry("dq_profile_approx").fn(spark, sf)
    // the scale property: HLL sketches aggregate in ONE pass, and the
    // certificate's exact NDVs are per-column SINGLE-distinct aggs
    // (two-phase, Expand-free) — only the exact twin's multi-column
    // countDistinct in one agg forces an Expand (4x the scan rows)
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile plans an Expand:\n$plan")
    // the BENCHED shape is the pure one-pass HLL profile: Expand-free
    // AND a single scan of orders (the certificate's five exact-NDV
    // scans are verify machinery, excluded from the measured operator)
    val benchPlan = graft.SparkEntry.registry("dq_profile_approx").benchFn
      .getOrElse(fail("dq_profile_approx must register a bench shape"))
      .apply(spark, sf).queryExecution.executedPlan.toString
    assert(!benchPlan.contains("Expand"))
    // r13: the NDV sketch is hll_sketch_agg — ONE opaque binary buffer
    // per column (a TypedImperativeAggregate), so the whole profile
    // plans as a single-scan ObjectHashAggregate where string min/max
    // buffers are also fine. The former approx_count_distinct(0.01)
    // exposed 1640 LONG buffer attributes PER COLUMN and demoted the
    // aggregate to interpreted SortAggregate (or a pathological
    // wide-row HashAggregate) with a 529 KB plan.
    val scans = "Scan parquet".r.findAllIn(benchPlan).size
    assert(scans == 1, s"bench shape should scan orders once, saw $scans")
    assert(benchPlan.contains("ObjectHashAggregate"),
      s"sketch profile must plan as ObjectHashAggregate:\n$benchPlan")
    assert(!benchPlan.contains("SortAggregate"),
      s"sketch profile must not fall back to SortAggregate:\n$benchPlan")
    val exactPlan = graft.SparkEntry.registry("dq_profile").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "expected the exact twin to carry the Expand this variant removes")
    // exact twin (r13): string min/max hoisted to a narrow scan so the
    // Expand path stays on HashAggregate; SortAggregate may appear
    // ONLY on that narrow status-min/max branch.
    assert(exactPlan.linesIterator.filter(_.contains("SortAggregate"))
      .forall(l => l.contains("o_orderstatus") && !l.contains("count")),
      "exact twin's Expand path must stay on HashAggregate (r13 hoist)")
    val rows = approxDf.collect()
    val exact = graft.SparkEntry.registry("dq_profile").fn(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getLong(4))).toMap
    assert(rows.length == exact.size)
    // the in-query certificate: every HLL estimate within 5% of exact
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: HLL NDV off >5% from exact")
    }
    // min/max/null counts are NOT approximated — they must be equal
    rows.foreach { r =>
      assert(exact(r.getString(0)) == ((r.getString(1), r.getString(2), r.getLong(4))))
    }
  }

  test("JDBC sink round-trips nulls and typed columns") {
    import org.apache.spark.sql.types._
    val url = derbyUrl("types")
    val backend = new JdbcBackend(url)
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("m", DecimalType(12, 4))))
    backend.insertBatch("typed", "p00000-b00000", schema, Seq(
      org.apache.spark.sql.Row(1, 2.5, true, "x",
        new java.math.BigDecimal("12.3400")),
      org.apache.spark.sql.Row(null, null, null, null, null)))
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT i, d, b, s, m FROM typed ORDER BY i NULLS LAST")
      assert(rs.next())
      assert(rs.getInt(1) == 1 && rs.getDouble(2) == 2.5 && rs.getBoolean(3)
        && rs.getString(4) == "x"
        && rs.getBigDecimal(5).compareTo(new java.math.BigDecimal("12.34")) == 0)
      assert(rs.next())
      rs.getInt(1); assert(rs.wasNull())
      assert(!rs.next())
    } finally c.close()
  }
}
