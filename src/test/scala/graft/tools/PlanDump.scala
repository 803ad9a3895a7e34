package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for named bench queries to
  * `<outDir>/<name>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/r13/.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [query ...]
  * (no query names = every bench query).
  *
  * The dumped plan is the BENCHED shape: benchFn if registered, after
  * GraftBenchShim.stripTopSort, on SPARK_GRAFT_SF_DIR — exactly what
  * Bench times. With SPARK_GRAFT_EXECUTED=1 the query is first run
  * through the noop sink and the dump is the AQE-final executed plan
  * instead of the static one.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val executed = sys.env.get("SPARK_GRAFT_EXECUTED").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val only = args.drop(2).toSet
    val qs = graft.SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter(kv => only.isEmpty || only(kv._1))
    qs.foreach { case (name, fn) =>
      try {
        val df = org.apache.spark.sql.GraftBenchShim.stripTopSort(fn(spark, sfDir))
        if (executed) df.write.format("noop").mode("overwrite").save()
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] $name ok (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
