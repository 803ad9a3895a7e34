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
    "stream_window_agg", "stream_dedup",
    "q07_volume_shipping", "q09_profit_by_nation_year",
    "q16_supplier_relationship", "q18_large_orders", "q19_brand_or",
    "ch_histogram", "q_subquery_scalar", "q_in_subquery",
    "q_not_in_trap", "q_cross_join")

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

  // ---- the CH-SPELLED surface ------------------------------------------
  // The same registry semantics written the way a ClickHouse user
  // actually writes them — argMax, uniq/uniqExact, countIf/sumIf,
  // groupArray/groupUniqArray/arraySort/arrayStringConcat,
  // groupBit*, topK, quantileTDigest — through spark.sql via the
  // functions/ChAliases registrations, asserted cell-exact against
  // each operator's DataFrame twin. (CH's parametric form f(p)(x)
  // flattens to f(x, p); see ChAliases' dialect notes.)
  private def k1Cert(estCol: String, q: Double, alias: String): String = {
    val tol = 8 * math.Pi * math.sqrt(q * (1 - q)) / 200.0
    s"""(count_if(x < $estCol) <= $q * count(*) + greatest($tol * count(*), 4.0)
       | AND count_if(x <= $estCol) >= $q * count(*) - greatest($tol * count(*), 4.0))
       | AS $alias""".stripMargin
  }

  private val chSpelled: Seq[(String, String)] = Seq(
    "ch_argmax" -> """
      SELECT n_name,
             argMax(c_name, struct(c_acctbal, c_custkey)) AS richest_customer,
             max(c_acctbal) AS max_acctbal,
             argMin(c_name, struct(c_acctbal, c_custkey)) AS poorest_customer,
             min(c_acctbal) AS min_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "ch_mode" -> """
      WITH counted AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders GROUP BY 1, 2)
      SELECT o_orderstatus,
             argMax(o_orderpriority, struct(cnt, o_orderpriority)) AS mode_priority,
             max(cnt) AS mode_n
      FROM counted GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "ch_uniq" -> """
      SELECT event_type, uniqExact(user_id) AS uniq_users, count(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type""",
    "ch_uniq_hll" -> """
      SELECT event_type,
             uniqExact(user_id) AS uniq_users_exact,
             abs(uniq(user_id) - uniqExact(user_id))
               <= uniqExact(user_id) * 0.05 AS hll_within_5pct
      FROM events GROUP BY event_type ORDER BY event_type""",
    "ch_grouparray" -> """
      SELECT o_custkey,
             arrayStringConcat(arraySort(groupArray(o_orderstatus)), ',') AS statuses_all,
             arrayStringConcat(arraySort(groupUniqArray(o_orderstatus)), ',') AS statuses_uniq,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "ch_group_concat" -> """
      SELECT n_regionkey,
             arrayStringConcat(arraySort(groupArray(n_name)), ',') AS nations,
             count(*) AS n
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "ch_groupbit" -> """
      SELECT o_orderstatus, groupBitAnd(o_orderkey) AS band,
             groupBitOr(o_orderkey) AS bor, groupBitXor(o_orderkey) AS bxor,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "ch_topk_sketch" -> """
      SELECT x._1 AS p_brand, x._2 AS cnt
      FROM (SELECT explode(topK(p_brand, 5)) AS x FROM part)
      ORDER BY cnt DESC, p_brand ASC""",
    "ch_quantile_tdigest_k1" -> s"""
      WITH li AS (
        SELECT l_returnflag,
               CAST(l_extendedprice * (1.0 + l_tax) * (1.0 - l_discount)
                 AS DOUBLE) AS x
        FROM lineitem),
      est AS (
        SELECT l_returnflag,
               quantileTDigest(x, 0.5) AS e50,
               quantileTDigest(x, 0.99) AS e99,
               quantileTDigest(x, 0.999) AS e999
        FROM li GROUP BY l_returnflag)
      SELECT li.l_returnflag, count(*) AS n_rows,
             ${k1Cert("e50", 0.5, "q50_rank_ok")},
             ${k1Cert("e99", 0.99, "q99_rank_ok")},
             ${k1Cert("e999", 0.999, "q999_rank_ok")}
      FROM li JOIN est ON li.l_returnflag = est.l_returnflag
      GROUP BY li.l_returnflag ORDER BY li.l_returnflag""",
    "f_agg_if" -> """
      SELECT o_orderpriority,
             countIf(o_orderstatus = 'F') AS n_finished,
             CAST(sumIf(CAST(o_totalprice AS DECIMAL(12,4)),
               o_orderstatus = 'F') AS DOUBLE) AS sum_finished,
             countIf(o_totalprice > 200000) AS n_big,
             uniqExact(CASE WHEN o_orderstatus = 'O' THEN o_custkey END)
               AS uniq_open_custs
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  test("CH-spelled SQL (argMax/uniq/countIf/groupArray/topK/quantileTDigest...) equals the DataFrame twins") {
    assert(chSpelled.map(_._1).count(_.startsWith("ch_")) >= 8,
      "the CH-spelled set must keep >= 8 ch_* rows")
    val results = chSpelled.map { case (name, sqlText) =>
      val q = SparkEntry.registry(name)
      val viaSql =
        try canon(GraftSql.sql(spark, sf, sqlText))
        catch {
          case e: Exception =>
            fail(s"$name CH-spelled SQL failed under spark.sql: ${e.getMessage
              .linesIterator.take(3).mkString(" / ")}")
        }
      val viaDf = canon(q.fn(spark, sf))
      assert(viaSql == viaDf,
        s"$name: CH-spelled SQL diverges from the DataFrame API")
      name
    }
    assert(results.size == chSpelled.size)
    assert(flagship.size + chSpelled.size >= 35,
      "combined SQL-veneer flagship set must stay >= 35 entries")
  }
}
