package graft

/** The SQL-string entry point ([[GraftSql]]): a flagship slice of the
  * registry must be reachable through `spark.sql` over the registered
  * views, producing the SAME rows as the DataFrame API — the
  * ergonomics a ClickHouse-migrating user expects. The SQL run here
  * is each entry's own ORACLE text (written for DuckDB in near-ANSI
  * SQL), so a pass also proves that slice of the oracle corpus is
  * dialect-portable.
  */
class SqlEntrySpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq.map {
        case d: Double => f"$d%.9e" // engine-exact doubles; fixed repr
        case x => String.valueOf(x)
      }.mkString("|")).sorted.toIndexedSeq
  }

  // registry entries whose ORACLE SQL is ANSI enough to run on Spark
  // unchanged — the curated flagship set (TPC-H analogs, joins,
  // windows, CH semantics). Curation rule: every name listed here
  // MUST run and match; growth is welcome, silent shrink is not.
  private val flagship = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q05_revenue_by_nation",
    "q06_forecast_revenue", "q10_returned_items", "q14_promo_revenue",
    "q_semi_join", "q_anti_join", "q_having", "q_order_limit",
    "q_union_dedup", "ch_limit_by", "ch_argmax", "graph_degrees",
    "q04_order_priority", "q12_late_lines", "q13_custdist",
    "q_window_topn", "q_intersect", "q_except", "ch_retention",
    "stream_window_agg", "stream_dedup")

  test("flagship oracle SQL runs through spark.sql and equals the DataFrame twin") {
    val results = flagship.map { name =>
      val q = SparkEntry.registry(name)
      val sqlText = q.oracle.getOrElse(fail(s"$name has no oracle"))
      val viaSql =
        try canon(GraftSql.sql(spark, sf, sqlText))
        catch {
          case e: Exception =>
            fail(s"$name oracle SQL failed under spark.sql: ${e.getMessage
              .linesIterator.take(3).mkString(" / ")}")
        }
      val viaDf = canon(q.fn(spark, sf))
      assert(viaSql == viaDf,
        s"$name: spark.sql result diverges from the DataFrame API")
      name
    }
    assert(results.size == flagship.size)
  }
}
