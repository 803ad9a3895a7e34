package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Advanced analytics surface: rank statistics (AUC), hypothesis
  * tests from exact moments, interval-union measures, and the
  * dynamic-partition-pruning scan path.
  *
  * Exactness follows the Stats.scala playbook: every aggregate the
  * final formula consumes is an exact integer/decimal sum, and the
  * closing floating-point expression is written with the identical
  * IEEE operation tree in Spark and the DuckDB oracle.
  */
object Advanced {

  /** Exact decimal product sum, integer-rounded then cast to double
    * (unscaled < 2^53 keeps both engines' casts exact). */
  private def isum(c: Column): Column =
    sum(c).cast(DecimalType(38, 0)).cast("double")

  /** DuckDB mirror — explicit round() first because DuckDB's decimal
    * rescale truncates where Spark rounds HALF_UP. */
  private def isumSql(e: String): String =
    s"CAST(CAST(round(sum($e), 0) AS DECIMAL(38,0)) AS DOUBLE)"

  private def tmp(dir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  /** One-time month-partitioned lineitem layout for the DPP scan (a
    * fact written PARTITION BY month, the ClickHouse layout
    * ch_final_write demonstrates). Written once per corpus per JVM —
    * the _SUCCESS marker makes re-entry a no-op, so bench iterations
    * measure the pruned JOIN, not the rewrite.
    */
  private def dppLayout(s: SparkSession, dir: String): String = {
    val path = tmp(dir, "dpp")
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.isFile) {
      graft.sources.Sink.writePartitionedSorted(
        Tables.lineitem(s, dir), path,
        "ship_month" -> date_format(col("l_shipdate"), "yyyy-MM"),
        Seq("l_orderkey"))
    }
    path
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // ROC AUC as a rank statistic (the Mann-Whitney U formulation):
    // does order value separate finished ('F') orders from the rest,
    // per priority class? Two window passes compute 2x the average
    // rank of every row (2*rank + ties - 1 stays integer), one hash
    // aggregation collects the three exact integers the closing
    // formula needs: AUC = (2S - P(P+1)) / (2 P N). Everything before
    // the single IEEE division is exact integer arithmetic, so both
    // engines emit bit-identical doubles. Scales as one sort per
    // group (the honest cost of ranking) + one agg; no per-group
    // buffering.
    "ch_auc" -> Q(
      (s, dir) => {
        val byScore = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice")
        val ties = Window.partitionBy("o_orderpriority", "o_totalprice")
        Tables.orders(s, dir)
          .withColumn("two_r",
            lit(2L) * rank().over(byScore) + count(lit(1)).over(ties) - 1L)
          .withColumn("pos",
            (col("o_orderstatus") === "F").cast("long"))
          .groupBy("o_orderpriority")
          .agg(sum(when(col("pos") === 1L, col("two_r"))).as("s2"),
            sum(col("pos")).as("p"),
            (count(lit(1)) - sum(col("pos"))).as("n"))
          .select(col("o_orderpriority"), col("p"), col("n"),
            ((col("s2") - col("p") * (col("p") + 1L)).cast("double") /
              (lit(2L) * col("p") * col("n")).cast("double")).as("auc"))
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH r AS (
          SELECT o_orderpriority,
                 2 * rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice)
                   + count(*) OVER (PARTITION BY o_orderpriority, o_totalprice)
                   - 1 AS two_r,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
          FROM orders),
        m AS (SELECT o_orderpriority,
                     sum(CASE WHEN pos = 1 THEN two_r END) AS s2,
                     sum(pos) AS p, count(*) - sum(pos) AS n
              FROM r GROUP BY o_orderpriority)
        SELECT o_orderpriority, CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
               CAST(s2 - p * (p + 1) AS DOUBLE)
                 / CAST(2 * p * n AS DOUBLE) AS auc
        FROM m ORDER BY o_orderpriority"""),
    ),

    // ------------------------------------------------------------------
    // Welch's two-sample t-test from exact conditional moments (CH
    // welchTTest): per return flag, does extended price differ
    // between high-discount (> 0.05) and low-discount lines? One hash
    // aggregation computes all six moments map-side-combinably; the
    // t statistic and Welch-Satterthwaite df are a closing expression
    // on exact operands with the identical IEEE tree in both engines.
    "ch_ttest" -> Q(
      (s, dir) => {
        val p = d(col("l_extendedprice"))
        val hi = col("l_discount") > 0.05
        val m = Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("n1"),
            dsum(when(hi, col("l_extendedprice"))).as("s1"),
            isum(when(hi, p * p)).as("ss1"),
            sum(when(hi, 0L).otherwise(1L)).as("n2"),
            dsum(when(!hi, col("l_extendedprice"))).as("s2"),
            isum(when(!hi, p * p)).as("ss2"))
        val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
        val v1 = (col("ss1") - col("s1") * col("s1") / n1) / (n1 - 1.0)
        val v2 = (col("ss2") - col("s2") * col("s2") / n2) / (n2 - 1.0)
        val a = v1 / n1; val b = v2 / n2
        m.select(col("l_returnflag"), col("n1"), col("n2"),
            ((col("s1") / n1 - col("s2") / n2) / sqrt(a + b)).as("t_stat"),
            ((a + b) * (a + b) /
              (a * a / (n1 - 1.0) + b * b / (n2 - 1.0))).as("welch_df"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        WITH m AS (
          SELECT l_returnflag,
                 sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS n1,
                 CAST(sum(CASE WHEN l_discount > 0.05
                          THEN ${S.d("l_extendedprice")} END) AS DOUBLE) AS s1,
                 ${isumSql(s"CASE WHEN l_discount > 0.05 THEN ${S.d("l_extendedprice")} * CAST(l_extendedprice AS DECIMAL(19,4)) END")} AS ss1,
                 sum(CASE WHEN l_discount > 0.05 THEN 0 ELSE 1 END) AS n2,
                 CAST(sum(CASE WHEN NOT l_discount > 0.05
                          THEN ${S.d("l_extendedprice")} END) AS DOUBLE) AS s2,
                 ${isumSql(s"CASE WHEN NOT l_discount > 0.05 THEN ${S.d("l_extendedprice")} * CAST(l_extendedprice AS DECIMAL(19,4)) END")} AS ss2
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               (s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
                 / sqrt((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                        + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE))
                 AS t_stat,
               ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE))
               * ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                  + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE))
               / ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                  * ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE))
                  / (CAST(n1 AS DOUBLE) - 1.0)
                  + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE)
                  * ((ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE))
                  / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df
        FROM m ORDER BY l_returnflag"""),
    ),

    // ------------------------------------------------------------------
    // intervalLengthSum: each event opens a 30-minute activity
    // interval; per user, the UNION length of those intervals (overlap
    // counted once) and the number of disjoint activity islands. The
    // classic sweep: a running max-end window marks island starts, a
    // running sum numbers the islands, one agg measures each island,
    // one more totals per user — all integer microsecond arithmetic,
    // all linear in events per user, no interval buffering.
    "ch_interval_length_sum" -> Q(
      (s, dir) => {
        val iv = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us").as("st"),
            (col("ts_us") + 1800000000L).as("en"))
        val w = Window.partitionBy("user_id").orderBy("st")
        val prevMax = max(col("en"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
        iv.withColumn("new_island",
            when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
          .withColumn("island",
            sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "island")
          .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
          .groupBy("user_id")
          .agg(sum(col("ien") - col("ist")).as("busy_us"),
            count(lit(1)).as("n_islands"))
          .orderBy("user_id")
      },
      Some("""
        WITH iv AS (SELECT user_id, epoch_us(ts) AS st,
                           epoch_us(ts) + 1800000000 AS en FROM events),
        m AS (SELECT user_id, st, en,
                CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     IS NULL
                     OR st > max(en) OVER (PARTITION BY user_id ORDER BY st
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     THEN 1 ELSE 0 END AS new_island
              FROM iv),
        isl AS (SELECT user_id, st, en,
                  sum(new_island) OVER (PARTITION BY user_id ORDER BY st
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                FROM m),
        g AS (SELECT user_id, island, min(st) AS ist, max(en) AS ien
              FROM isl GROUP BY user_id, island)
        SELECT user_id, CAST(sum(ien - ist) AS BIGINT) AS busy_us,
               count(*) AS n_islands
        FROM g GROUP BY user_id ORDER BY user_id"""),
    ),

    // ------------------------------------------------------------------
    // Dynamic partition pruning: revenue per ship month read from the
    // month-partitioned fact layout, restricted to months in which an
    // urgent 1995 order was placed — a filter the engine only learns
    // AT RUNTIME from the dimension side. Catalyst turns the join key
    // into a dynamic partition filter on the fact scan (the broadcast
    // is reused as the pruning subquery), so only the qualifying
    // month directories are read — at 100 TB the difference between
    // scanning a year and scanning the months that matter.
    // AdvancedSpec asserts `dynamicpruning` appears in the fact
    // scan's partition filters.
    "q_dpp" -> Q(
      (s, dir) => {
        val fact = s.read.parquet(dppLayout(s, dir))
        val months = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            year(col("o_orderdate")) === 1995)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
          .distinct()
        fact.join(broadcast(months), "ship_month")
          .groupBy("ship_month")
          .agg(psum(d(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy("ship_month")
      },
      Some(s"""
        WITH months AS (
          SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
          FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND date_part('year', o_orderdate) = 1995)
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               ${S.revenue("l_extendedprice", "l_discount")} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN months ON strftime(l_shipdate, '%Y-%m') = months.ship_month
        GROUP BY 1 ORDER BY ship_month"""),
    ),
  )
}
