package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway micro-experiments for the optimization round. Not part of
  * any driver surface.
  */
object Scratch {
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
    graft.functions.GraftFunctions.register(spark)
    import graft.Dec

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-40s " + ts.map(t => f"$t%.3f").mkString(" "))
    }

    val li = graft.Tables.lineitem(spark, sfDir)
    time("noop 1col scan")(li.select("l_orderkey"))
    time("noop full scan")(li)
    time("agg double sum")(li.groupBy("l_suppkey").agg(sum(col("l_extendedprice"))))
    time("agg decimal12_4 sum")(li.groupBy("l_suppkey").agg(sum(col("l_extendedprice").cast(Dec.D))))
    time("agg dsum (decimal->double)")(li.groupBy("l_suppkey").agg(Dec.dsum(col("l_extendedprice"))))
    time("agg long cents sum")(li.groupBy("l_suppkey").agg(sum(expr("CAST(l_extendedprice * 10000 AS BIGINT)"))))
    time("agg psum revenue")(li.groupBy("l_suppkey").agg(Dec.psum(Dec.d(col("l_extendedprice")) * Dec.oneMinus(col("l_discount")))))
    time("global agg 20 cols-ish")(li.agg(sum("l_quantity"), sum("l_extendedprice"), min("l_shipdate"), max("l_shipdate"), count(lit(1))))
    time("round6 project")(li.select(round(col("l_extendedprice") * 1.1, 6)))
    time("libm project")(li.select(exp(col("l_discount")), sin(col("l_discount")), log10(col("l_extendedprice"))))
    time("orderBy suppkey")(li.select("l_suppkey", "l_extendedprice").orderBy("l_suppkey"))
    spark.stop()
  }
}
