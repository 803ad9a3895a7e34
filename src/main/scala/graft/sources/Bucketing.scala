package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located-join layout. Writing both
  * fact tables bucketed (and sorted) by the join key lets Spark plan
  * their join with NO shuffle exchange on either side — at 100 TB
  * that turns the dominant network cost of a fact-fact join into a
  * local sort-merge per bucket. The bucket count is the knob: it
  * bounds per-task memory and sets join parallelism.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table in the session
    * catalog (idempotent: overwrites). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Ensure the bucketed twins of orders+lineitem exist for `dir`;
    * returns their table names. Table identity is keyed by the
    * scale-factor dir so different SFs never collide.
    */
  def ensureOrdersLineitem(s: SparkSession, dir: String, buckets: Int = 16)
      : (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_buckets_$tag"
    val (ot, lt) = (s"graft_orders_$tag", s"graft_lineitem_$tag")
    if (!s.catalog.tableExists(ot)) {
      writeBucketed(graft.Tables.orders(s, dir), ot, s"$root/orders", buckets,
        "o_orderkey")
      writeBucketed(graft.Tables.lineitem(s, dir), lt, s"$root/lineitem", buckets,
        "l_orderkey")
    }
    (ot, lt)
  }
}
