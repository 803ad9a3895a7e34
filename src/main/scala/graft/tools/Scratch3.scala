package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** graph_pagerank / graph family experiments (r13). */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeFull(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = mk
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[s3] $name%-34s " + ts.map(t => f"$t%.2f").mkString(" "))
    }

    // phase timing of the current operator internals
    val t0 = System.nanoTime()
    val edges = graft.operators.Graph.tradeEdges(spark, sfDir)
    edges.write.format("noop").mode("overwrite").save()
    println(f"[s3] tradeEdges alone: ${(System.nanoTime() - t0) / 1e9}%.2f")

    timeFull("pagerank current")(
      graft.operators.Graph.pageRank(
        graft.operators.Graph.tradeEdges(spark, sfDir), iters = 6))

    timeFull("shortest_path current") {
      val e = graft.operators.Graph.tradeEdges(spark, sfDir)
      val sources = e.select(col("src").as("node"))
        .filter(col("node") <= 20).distinct()
      graft.operators.Graph.shortestPaths(e, sources, maxDepth = 3)
    }
    spark.stop()
  }
}
