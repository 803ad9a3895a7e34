package graft

/** Dev smoke check mirroring the driver's entry probe: runs
  * [[SparkEntry.entry]] on sf0.001 and requires rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(8)
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(3).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned 0 rows")
    println(s"[smoke] queries registered: ${SparkEntry.queries.size}, " +
      s"oracles: ${SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
