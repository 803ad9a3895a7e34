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
}
