package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TimeTravelSpec extends SparkSpec {

  private def freshRoot(tag: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_tt_$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  test("append commits compose; every old version stays exactly readable") {
    val root = freshRoot("append")
    val o = Tables.orders(spark, sf)
    val v1 = TimeTravel.commitAppend(o.filter(col("o_orderdate") < "1997-01-01"), root)
    val c1 = TimeTravel.readVersion(spark, root, v1).count()
    val v2 = TimeTravel.commitAppend(o.filter(col("o_orderdate") >= "1997-01-01"), root)

    assert(v1 == 1 && v2 == 2)
    assert(TimeTravel.currentVersion(spark, root) == 2)
    // v1 unchanged after v2's publish — the snapshot a reader pinned
    // before the append still reads the same rows
    assert(TimeTravel.readVersion(spark, root, v1).count() == c1)
    // v2 = the full table
    assert(TimeTravel.readVersion(spark, root, v2).count() == o.count())
    assert(TimeTravel.readLatest(spark, root).count() == o.count())
  }

  test("overwrite replaces the current snapshot without touching history") {
    val root = freshRoot("overwrite")
    val o = Tables.orders(spark, sf)
    val v1 = TimeTravel.commitAppend(o, root)
    // files composing v1, fingerprinted (path, length, mtime)
    def v1Files = new java.io.File(s"$root/data/s1").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    val before = v1Files

    val kept = o.filter(col("o_orderstatus") =!= "F")
    val v2 = TimeTravel.commitOverwrite(kept, root)

    assert(TimeTravel.readVersion(spark, root, v2).count() == kept.count())
    // the GDPR-style rewrite never rewrote or deleted a v1 data file:
    // v1 still reads its full snapshot from byte-identical files
    assert(TimeTravel.readVersion(spark, root, v1).count() == o.count())
    assert(v1Files == before, "overwrite touched a historical data file")
  }

  test("WAP: a failing audit aborts the stage; published versions untouched") {
    val root = freshRoot("wap")
    val o = Tables.orders(spark, sf)
    val v1 = TimeTravel.commitAppend(o, root)
    val rows1 = TimeTravel.readVersion(spark, root, v1).count()

    // corrupt batch: planted NULL order dates
    val bad = o.limit(50).withColumn("o_orderdate",
      lit(null).cast(o.schema("o_orderdate").dataType))
    TimeTravel.stage(bad, root, "bad")
    val audit = Dq.scanChecks(TimeTravel.readStaged(spark, root, "bad"), Seq(
      Dq.rowRule("null_orderdate", col("o_orderdate").isNull),
      Dq.uniqueRule("dup_orderkey", col("o_orderkey"))))
    assert(!Dq.passes(audit), "planted corruption passed the audit")
    TimeTravel.abortStaged(spark, root, "bad")

    // nothing moved: same current version, same rows, stage gone
    assert(TimeTravel.currentVersion(spark, root) == v1)
    assert(TimeTravel.readLatest(spark, root).count() == rows1)
    assert(!new java.io.File(s"$root/data/stage-bad").exists())

    // the clean batch sails through the same gate
    TimeTravel.stage(o.limit(10), root, "good")
    val audit2 = Dq.scanChecks(TimeTravel.readStaged(spark, root, "good"),
      Seq(Dq.rowRule("null_orderdate", col("o_orderdate").isNull)))
    assert(Dq.passes(audit2))
    val v2 = TimeTravel.publishStaged(spark, root, "good")
    assert(v2 == v1 + 1)
    assert(TimeTravel.readLatest(spark, root).count() == rows1 + 10)
  }

  test("a commit never reshuffles reads: pushdown survives time travel") {
    val root = freshRoot("pushdown")
    TimeTravel.commitAppend(Tables.orders(spark, sf), root): Unit
    val q = TimeTravel.readLatest(spark, root)
      .filter(col("o_custkey") === 42).select("o_orderkey", "o_custkey")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_custkey"),
      s"filter not pushed into the versioned scan:\n$scan")
  }
}
