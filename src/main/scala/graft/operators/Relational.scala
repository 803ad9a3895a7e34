package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Group A of SURVEY.md §2 — the relational query surface.
  *
  * Every query is declared with the DataFrame API so Catalyst handles
  * predicate pushdown, column pruning and join planning; dimension
  * tables ride broadcast joins (region/nation/supplier/part are tiny
  * at any realistic scale factor; customer/orders are broadcast-able
  * at test SF and shuffle-join cleanly at 100 TB because every join
  * below keys on the natural equi-join key).
  */
object Relational {

  private def ts(s: String) = lit(s).cast("timestamp")

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    "q01_pricing_summary" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= ts("2000-06-01"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            psumRev(col("l_extendedprice"), col("l_discount"))
              .as("sum_disc_price"),
            psumLong(6, revL(col("l_extendedprice"), col("l_discount"))
              * centsOnePlus(col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${S.dsum("l_quantity")} AS sum_qty,
               ${S.dsum("l_extendedprice")} AS sum_base_price,
               ${S.revenue("l_extendedprice", "l_discount")} AS sum_disc_price,
               ${S.psum(s"${S.d("l_extendedprice")} * ${S.oneMinus("l_discount")} * ${S.onePlus("l_tax")}")} AS sum_charge,
               ${S.davg("l_quantity")} AS avg_qty,
               ${S.davg("l_extendedprice")} AS avg_price,
               ${S.davg("l_discount")} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-06-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------------
    "q03_shipping_priority" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1998-01-01"))
        val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1998-01-01"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate")
          .agg(psumRev(col("l_extendedprice"), col("l_discount"))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some(s"""
        SELECT l_orderkey, o_orderdate,
               ${S.revenue("l_extendedprice", "l_discount")} AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10""")),

    // ------------------------------------------------------------------
    "q05_revenue_by_nation" -> Q(
      (s, dir) => {
        val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val n = Tables.nation(s, dir)
        val c = Tables.customer(s, dir)
        val sup = Tables.supplier(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01"))
        val l = Tables.lineitem(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(psumRev(col("l_extendedprice"), col("l_discount"))
            .as("revenue"))
          .orderBy(col("revenue").desc)
      },
      Some(s"""
        SELECT n_name, ${S.revenue("l_extendedprice", "l_discount")} AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC""")),

    // ------------------------------------------------------------------
    "q06_forecast_revenue" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01") &&
            col("l_discount").between(0.03, 0.05) &&
            col("l_quantity") < 24)
          .agg(psumLong(4, cents(col("l_extendedprice")) * cents(col("l_discount")))
            .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""
        SELECT ${S.psum(s"${S.d("l_extendedprice")} * ${S.d("l_discount")}")}
                 AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05
          AND l_quantity < 24""")),

    // ------------------------------------------------------------------
    "q09_profit_by_nation_year" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        val sup = Tables.supplier(s, dir)
        val n = Tables.nation(s, dir)
        val o = Tables.orders(s, dir)
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(psumRev(col("l_extendedprice"), col("l_discount"))
            .as("amount"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               ${S.revenue("l_extendedprice", "l_discount")} AS amount
        FROM lineitem, part, supplier, nation, orders
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
          AND p_type = 'ECONOMY'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC""")),

    // ------------------------------------------------------------------
    "q10_returned_items" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        val n = Tables.nation(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(psumRev(col("l_extendedprice"), col("l_discount"))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               ${S.revenue("l_extendedprice", "l_discount")} AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20""")),

    // ------------------------------------------------------------------
    "q_semi_join" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    "q_anti_join" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        // anti against a filtered subset so the result is non-trivial
        val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    "q_outer_join" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey", "c_name")
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
          .orderBy("c_custkey")
      },
      Some(s"""
        SELECT c_custkey, c_name,
               count(o_orderkey) AS n_orders,
               coalesce(${S.dsum("o_totalprice")}, 0.0) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // Top-3 orders per market segment as a bounded-heap SELECTION
    // aggregate (graft.functions.TopK): the 5-key partitionBy window
    // sorted each segment's orders in ONE task — a #groups-core
    // ceiling on any cluster. Selection consumes the joined stream
    // in its own stage (map-side O(k) partials); the 5x3-row result
    // broadcast-joins back to orders for the payload.
    "q_window_topn" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val top = o.join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(graft.functions.TopK(3, col("o_totalprice"), col("o_orderkey"))
            .as("ids"))
          .select(col("c_mktsegment"),
            posexplode(col("ids")).as(Seq("pos", "o_orderkey")))
          .select(col("c_mktsegment"), col("o_orderkey"),
            (col("pos") + 1).cast("integer").as("rn"))
        o.select(col("o_orderkey"), col("o_totalprice"))
          .join(broadcast(top), Seq("o_orderkey"))
          .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
          .orderBy("c_mktsegment", "rn")
      },
      Some("""
        SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
        FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey)
        WHERE rn <= 3 ORDER BY c_mktsegment, rn""")),

    // ------------------------------------------------------------------
    "q_window_running" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .withColumn("running_spend", sum(d(col("o_totalprice"))).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some(s"""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(${S.d("o_totalprice")}) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // ------------------------------------------------------------------
    // RANGE frame over event time: per-user rolling 1-hour event
    // count — the frame is VALUE-based (ts within [t-1h, t]), not
    // row-count-based, which rows-between cannot express.
    "q_window_range" -> Q(
      (s, dir) => {
        val hourUs = 3600L * 1000000L
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-hourUs, 0)
        Tables.events(s, dir)
          .withColumn("events_last_hour", count(lit(1)).over(w))
          .select("user_id", "event_id", "ts_us", "events_last_hour")
          .orderBy("user_id", "ts_us", "event_id")
      },
      Some("""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                 AS events_last_hour
        FROM events ORDER BY user_id, ts_us, event_id""")),

    // ------------------------------------------------------------------
    // first_value / last_value / nth_value with an explicit full-
    // partition frame (last_value over the default frame is the
    // classic silent-wrong-answer; the full frame is the useful one).
    "q_window_firstlast" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_key"),
            last(col("o_orderkey")).over(w).as("last_key"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_key,
               last_value(o_orderkey) OVER w AS last_key,
               nth_value(o_orderkey, 2) OVER w AS second_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey""")),

    // ------------------------------------------------------------------
    "q_window_lag" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
        Tables.events(s, dir)
          .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
          .select("user_id", "event_id", "ts_us", "gap_us")
          .orderBy("user_id", "ts_us", "event_id")
      },
      Some("""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)) AS gap_us
        FROM events ORDER BY user_id, ts_us, event_id""")),

    // ------------------------------------------------------------------
    "q_rollup" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        // Spark 4.1's ambiguous-self-join detector false-positives on
        // Dataset.rollup over any join, so this one goes through the SQL
        // front-end (same Catalyst plan, no plan-id column tagging).
        o.join(c, col("o_custkey") === col("c_custkey"))
          .select("c_mktsegment", "o_orderstatus", "o_totalprice")
          .createOrReplaceTempView("graft_q_rollup_src")
        s.sql(s"""
          SELECT c_mktsegment, o_orderstatus, count(*) AS n,
                 ${S.dsum("o_totalprice")} AS total
          FROM graft_q_rollup_src
          GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
          ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")
      },
      Some(s"""
        SELECT c_mktsegment, o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
        ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")),

    // ------------------------------------------------------------------
    // Arbitrary (non-hierarchical) GROUPING SETS — the general form
    // ROLLUP/CUBE specialize. Same SQL front-end route as q_rollup
    // (Spark expands to a single Expand + one aggregate: one pass,
    // one shuffle, grouping-id partial aggregation — same scale shape
    // as a plain groupBy).
    "q_grouping_sets" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        o.join(c, col("o_custkey") === col("c_custkey"))
          .select("c_mktsegment", "o_orderstatus", "o_totalprice")
          .createOrReplaceTempView("graft_q_gsets_src")
        s.sql(s"""
          SELECT c_mktsegment, o_orderstatus, count(*) AS n,
                 ${S.dsum("o_totalprice")} AS total
          FROM graft_q_gsets_src
          GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
                                  (o_orderstatus), ())
          ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")
      },
      Some(s"""
        SELECT c_mktsegment, o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
                                (o_orderstatus), ())
        ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")),

    // ------------------------------------------------------------------
    "q_cube" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               ${S.dsum("l_quantity")} AS qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ------------------------------------------------------------------
    "q_pivot" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        o.join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(dsum(col("o_totalprice")))
          .orderBy("c_mktsegment")
      },
      Some(s"""
        SELECT c_mktsegment,
               CAST(sum(CASE WHEN o_orderstatus = 'F'
                 THEN ${S.d("o_totalprice")} END) AS DOUBLE) AS F,
               CAST(sum(CASE WHEN o_orderstatus = 'O'
                 THEN ${S.d("o_totalprice")} END) AS DOUBLE) AS O,
               CAST(sum(CASE WHEN o_orderstatus = 'P'
                 THEN ${S.d("o_totalprice")} END) AS DOUBLE) AS P
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ------------------------------------------------------------------
    // UNPIVOT (wide -> long), the inverse of q_pivot.
    "q_unpivot" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            col("o_totalprice").cast("double").as("total"),
            col("o_custkey").cast("double").as("custkey"))
          .unpivot(Array(col("o_orderkey")),
            Array(col("total"), col("custkey")), "metric", "val")
          .orderBy("o_orderkey", "metric")
      },
      Some("""
        SELECT o_orderkey, metric, val
        FROM (UNPIVOT (SELECT o_orderkey,
                              CAST(o_totalprice AS DOUBLE) AS total,
                              CAST(o_custkey AS DOUBLE) AS custkey
                       FROM orders)
              ON total, custkey INTO NAME metric VALUE val)
        ORDER BY o_orderkey, metric""")),

    // ------------------------------------------------------------------
    "q_distinct_agg" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_orderstatus")
          .agg(countDistinct(col("o_custkey")).as("n_customers"),
            countDistinct(col("o_orderpriority")).as("n_priorities"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers,
               count(DISTINCT o_orderpriority) AS n_priorities,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    "q_having" -> Q(
      (s, dir) => {
        Tables.part(s, dir)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_parts"),
            dsum(col("p_retailprice")).as("total_price"))
          .filter(col("n_parts") >= 5)
          .orderBy("p_brand")
      },
      Some(s"""
        SELECT p_brand, count(*) AS n_parts,
               ${S.dsum("p_retailprice")} AS total_price
        FROM part GROUP BY p_brand HAVING count(*) >= 5
        ORDER BY p_brand""")),

    // ------------------------------------------------------------------
    "q_order_limit" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
          .limit(25)
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 25""")),

    // ------------------------------------------------------------------
    "q_union_dedup" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
        c.union(sup).distinct().orderBy("nationkey")
      },
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey""")),

    // ------------------------------------------------------------------
    "q_subquery_scalar" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val thr = o.agg((davg(col("o_totalprice")) * 1.5).as("thr"))
        o.crossJoin(broadcast(thr))
          .filter(col("o_totalprice") > col("thr"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some(s"""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT ${S.davg("o_totalprice")} * 1.5 FROM orders)
        ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    "q_case_expr" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .withColumn("bucket",
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 200000, "medium")
              .otherwise("large"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("bucket")
      },
      Some(s"""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               count(*) AS n, ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY 1 ORDER BY bucket""")),

    // ------------------------------------------------------------------
    // As-of join: for each event, the latest order of that customer at
    // or before the event timestamp. Spark lacks a native as-of join;
    // the scalable composition used here pre-aggregates the right side
    // into per-key sorted arrays (state = O(orders per key)), joins
    // once on the equi-key, and binary-searches with an array
    // expression — one shuffle, no row explosion.
    "q_asof_join" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir)
        val o = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sort_array(collect_list(col("o_orderdate"))).as("dates"))
        e.join(o, col("user_id") === col("o_custkey"), "left")
          .withColumn("asof_orderdate",
            array_max(filter(col("dates"), x => x <= col("ts"))))
          .select("event_id", "user_id", "ts_us", "asof_orderdate")
          .orderBy("event_id")
      },
      Some("""
        SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
               o.o_orderdate AS asof_orderdate
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        ORDER BY e.event_id""")),

    // ------------------------------------------------------------------
    // Gap-based sessionization as a batch query (streaming variant in
    // graft.streaming): a new session starts after a >30 min gap.
    "q_sessionize" -> Q(
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
        Tables.events(s, dir)
          .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
          .withColumn("new_session",
            (col("prev_us").isNull ||
              col("ts_us") - col("prev_us") > 1800L * 1000000L).cast("int"))
          .withColumn("session_seq",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_seq")
          .agg(min(col("ts_us")).as("session_start_us"),
            max(col("ts_us")).as("session_end_us"),
            count(lit(1)).as("n_events"),
            dsum(col("value")).as("session_value"))
          .orderBy("user_id", "session_seq")
      },
      Some(s"""
        WITH gaps AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
                 CASE WHEN lag(ts, 1) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w)
                           > CAST(1800000000 AS BIGINT)
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
        ), sessions AS (
          SELECT user_id, ts_us, value,
                 CAST(sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts_us ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_seq
          FROM gaps)
        SELECT user_id, session_seq,
               min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
               count(*) AS n_events, ${S.dsum("value")} AS session_value
        FROM sessions GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq""")),

    // ------------------------------------------------------------------
    // Recursive CTE (hierarchy walk): depth + root of every node in a
    // synthetic binary tree over supplier keys (parent(k) = k div 2 —
    // deterministic, derived purely from existing rows). Spark 4 runs
    // WITH RECURSIVE natively (UnionLoop); each iteration is one
    // broadcast-joinable step, state = frontier only. DuckDB runs the
    // identical recursion.
    "q_recursive_cte" -> Q(
      (s, dir) => {
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_rec")
        s.sql("""
          WITH RECURSIVE chain AS (
            SELECT s_suppkey, s_suppkey AS root, 0 AS depth
            FROM supplier_rec WHERE s_suppkey <= 1
            UNION ALL
            SELECT s.s_suppkey, c.root, c.depth + 1
            FROM supplier_rec s JOIN chain c ON s.s_suppkey DIV 2 = c.s_suppkey
            WHERE s.s_suppkey > 1)
          SELECT s_suppkey, root, CAST(depth AS INT) AS depth
          FROM chain ORDER BY s_suppkey""")
      },
      Some("""
        WITH RECURSIVE chain AS (
          SELECT s_suppkey, s_suppkey AS root, 0 AS depth
          FROM supplier WHERE s_suppkey <= 1
          UNION ALL
          SELECT s.s_suppkey, c.root, c.depth + 1
          FROM supplier s JOIN chain c ON s.s_suppkey // 2 = c.s_suppkey
          WHERE s.s_suppkey > 1)
        SELECT s_suppkey, root, CAST(depth AS INTEGER) AS depth
        FROM chain ORDER BY s_suppkey"""))
  )
}
