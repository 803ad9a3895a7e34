package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round probe: decompose each bench query's steady-state
  * time (the second sample, which best-of-2 reports) into
  *   build  — the registry fn call (includes any setup commits/writes
  *            the operator performs before returning its frame)
  *   plan   — Catalyst phases from the QueryPlanningTracker
  *            (analysis + optimization + physical planning)
  *   exec   — the noop-sink write minus the tracked phases
  * Prints one CSV line per query to argv(0) (default
  * /tmp/phase_probe.csv). Optional trailing args filter query names.
  *
  * This is measurement tooling only — the driver never runs it.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    val out = args.headOption.getOrElse("/tmp/phase_probe.csv")
    val only = args.drop(1).toSet
    val qs = graft.SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter(kv => only.isEmpty || only(kv._1))
    val sb = new StringBuilder("name,build_s,plan_s,exec_s,total_s\n")
    qs.foreach { case (name, fn) =>
      try {
        // warmup sample (pays codegen/JIT/file listing, as in Bench)
        val w = fn(spark, sfDir)
        org.apache.spark.sql.GraftBenchShim.stripTopSort(w)
          .write.format("noop").mode("overwrite").save()
        // measured sample
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val stripped = org.apache.spark.sql.GraftBenchShim.stripTopSort(df)
        stripped.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        val phases = stripped.queryExecution.tracker.phases
        val planMs = phases.values.map(p => p.endTimeMs - p.startTimeMs).sum
        val build = (t1 - t0) / 1e9
        val total = (t2 - t0) / 1e9
        val plan = planMs / 1e3
        val exec = (t2 - t1) / 1e9 - plan
        sb.append(f"$name,$build%.3f,$plan%.3f,$exec%.3f,$total%.3f\n")
        System.err.println(f"[probe] $name build=$build%.2f plan=$plan%.2f exec=$exec%.2f")
      } catch {
        case e: Throwable =>
          System.err.println(s"[probe] $name FAILED ${e.getClass.getSimpleName}")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    spark.stop()
  }
}
