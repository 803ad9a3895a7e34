package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-structure profiler for the setup-heavy operators (r13): counts
  * Spark jobs and their wall-clock inside each named bench query.
  */
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("S4_COMMITTER", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time): Unit
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(j.jobId, j.time)
        jobs.add((j.jobId, j.time - s)): Unit
      }
    })

    val names = if (args.nonEmpty) args.toSeq
      else Seq("sink_delete_mutation", "src_delta_dv", "sink_compact",
        "src_delta_checkpoint", "sink_dynamic_overwrite", "src_iceberg_prune")
    names.foreach { name =>
      val fn = graft.SparkEntry.benchQueries(name)
      // warmup
      org.apache.spark.sql.GraftBenchShim.stripTopSort(fn(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(200)
      jobs.clear()
      val t0 = System.nanoTime()
      org.apache.spark.sql.GraftBenchShim.stripTopSort(fn(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(f"[s4] $name%-26s total=$total%.2f jobs=${js.size} " +
        s"jobMs=[${js.map(_._2).mkString(",")}] sumJobMs=${js.map(_._2).sum}")
    }
    spark.stop()
  }
}
