package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * Tuned for the local[32] test harness but with settings chosen to
  * survive a 1000-executor cluster: AQE on (runtime re-plan, skew-join
  * splitting, partition coalescing), explicit shuffle partitions (the
  * 200 default is wrong locally; on a real cluster this would be set
  * to ~2-3x total cores), broadcast threshold sized for dimension
  * tables.
  */
object Session {
  def local(cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
