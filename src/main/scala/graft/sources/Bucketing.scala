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

  /** Bucket count sized to the data: ~250k fact rows per bucket
    * (bounds per-task sort memory), floored at 16 so small SFs keep
    * their historical layout, power-of-2 so repartitionings compose.
    * A FIXED bucket count is the classic bucketed-table scale trap —
    * at 10x the data each bucket sorts 10x the rows in the same task
    * (measured 22x super-linear at the sf1 scaling point); the knob
    * must grow with the table, which is also how a real warehouse
    * picks bucket counts at CREATE TABLE time.
    */
  def bucketsFor(rows: Long, rowsPerBucket: Long = 250000L): Int = {
    val want = math.max(16L, rows / rowsPerBucket)
    Integer.highestOneBit(math.min(want, 4096L).toInt)
  }

  /** Ensure the bucketed twins of orders+lineitem exist for `dir`;
    * returns their table names. Table identity is keyed by the
    * scale-factor dir so different SFs never collide. With
    * `buckets = 0` (default) the count is sized by [[bucketsFor]]
    * from the lineitem row count (a parquet-footer-only scan).
    */
  def ensureOrdersLineitem(s: SparkSession, dir: String, buckets: Int = 0)
      : (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_buckets_$tag"
    val (ot, lt) = (s"graft_orders_$tag", s"graft_lineitem_$tag")
    if (!s.catalog.tableExists(ot)) {
      val b =
        if (buckets > 0) buckets
        else bucketsFor(graft.Tables.lineitem(s, dir).count())
      writeBucketed(graft.Tables.orders(s, dir), ot, s"$root/orders", b,
        "o_orderkey")
      writeBucketed(graft.Tables.lineitem(s, dir), lt, s"$root/lineitem", b,
        "l_orderkey")
    }
    (ot, lt)
  }
}
