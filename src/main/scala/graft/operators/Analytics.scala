package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Additions beyond the base SURVEY §2 inventory: ClickHouse-style
  * behavioral analytics (windowFunnel, retention) and the bucketed
  * co-located fact-fact join.
  */
object Analytics {

  /** One day in micros — the funnel window. */
  private val DayUs = 86400L * 1000000L

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // windowFunnel(1 day)(signup -> click -> purchase): max step depth
    // per user. One pass per user over the time-sorted event array
    // with a single-level fold (no nested lambdas — those misbind);
    // the oracle phrases the same semantics as three staged mins.
    "ch_windowfunnel" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("ts_us"), col("event_type"))))
            .as("evs"))
          .withColumn("st", expr(s"""
            aggregate(evs,
              named_struct('t1', CAST(NULL AS BIGINT), 't2', CAST(NULL AS BIGINT),
                           't3', CAST(NULL AS BIGINT)),
              (a, e) -> named_struct(
                't1', IF(a.t1 IS NULL AND e.event_type = 'signup',
                         e.ts_us, a.t1),
                't2', IF(a.t2 IS NULL AND a.t1 IS NOT NULL
                         AND e.event_type = 'click'
                         AND e.ts_us > a.t1 AND e.ts_us <= a.t1 + ${DayUs}L,
                         e.ts_us, a.t2),
                't3', IF(a.t3 IS NULL AND a.t2 IS NOT NULL
                         AND e.event_type = 'purchase'
                         AND e.ts_us > a.t2 AND e.ts_us <= a.t1 + ${DayUs}L,
                         e.ts_us, a.t3)))"""))
          .select(col("user_id"),
            when(col("st.t3").isNotNull, 3)
              .when(col("st.t2").isNotNull, 2)
              .when(col("st.t1").isNotNull, 1)
              .otherwise(0).as("funnel_depth"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH s1 AS (
          SELECT user_id,
                 min(epoch_us(ts)) FILTER (event_type = 'signup') AS t1
          FROM events GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, min(epoch_us(e.ts)) AS t2
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND s1.t1 IS NOT NULL
            AND epoch_us(e.ts) > s1.t1 AND epoch_us(e.ts) <= s1.t1 + $DayUs
          GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id, min(epoch_us(e.ts)) AS t3
          FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase'
            AND epoch_us(e.ts) > s2.t2 AND epoch_us(e.ts) <= s1.t1 + $DayUs
          GROUP BY e.user_id)
        SELECT u.user_id,
               CASE WHEN s3.t3 IS NOT NULL THEN 3
                    WHEN s2.t2 IS NOT NULL THEN 2
                    WHEN s1.t1 IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_depth
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
        ORDER BY u.user_id""")),

    // ------------------------------------------------------------------
    // retention(day0 cond, day1 cond, day7 cond): per-user flags, the
    // CH retention() aggregate shape. Pure conditional aggregation.
    "ch_retention" -> Q(
      (s, dir) => {
        val day0 = lit("2024-01-01").cast("timestamp")
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(
            max(when(to_date(col("ts")) === to_date(day0), 1).otherwise(0))
              .as("r_day0"),
            max(when(to_date(col("ts")) === to_date(day0) + expr("INTERVAL 1 DAY"), 1)
              .otherwise(0)).as("r_day1"),
            max(when(to_date(col("ts")) === to_date(day0) + expr("INTERVAL 7 DAY"), 1)
              .otherwise(0)).as("r_day7"))
          .withColumn("r_day1", col("r_day0") * col("r_day1"))
          .withColumn("r_day7", col("r_day0") * col("r_day7"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id,
               max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01'
                 THEN 1 ELSE 0 END) AS r_day0,
               max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01'
                 THEN 1 ELSE 0 END)
                 * max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-02'
                 THEN 1 ELSE 0 END) AS r_day1,
               max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01'
                 THEN 1 ELSE 0 END)
                 * max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-08'
                 THEN 1 ELSE 0 END) AS r_day7
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // Approximate quantiles (CH quantileTDigest shape): estimator
    // values are engine-specific and cannot be cross-engine pinned,
    // but the Greenwald-Khanna RANK guarantee (accuracy=1000 -> rank
    // error <= n/1000) is the operator's contract — so the output
    // re-ranks each estimate against the data (one broadcast join of
    // the 3 estimate rows back onto lineitem) and emits a boolean per
    // quantile that the empirical rank landed within 0.005 of the
    // target; the oracle asserts the booleans. A broken estimator now
    // fails the hard driver gate.
    "ch_quantiles_approx" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val est = li.groupBy("l_returnflag")
          .agg(approx_percentile(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)), lit(1000)).as("ps"))
        def rankOk(i: Int, q: Double) =
          (abs(count_if(col("l_extendedprice") <= col("ps").getItem(i))
            / count(lit(1)) - lit(q)) <= lit(0.005)).as(s"p${(q * 100).toInt}_rank_ok")
        li.join(broadcast(est), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            rankOk(0, 0.25), rankOk(1, 0.5), rankOk(2, 0.75), rankOk(3, 0.9))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS p25_rank_ok, TRUE AS p50_rank_ok,
               TRUE AS p75_rank_ok, TRUE AS p90_rank_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    // End-to-end pipeline composition: raw events -> stateful
    // sessionization -> dimension enrichment -> per-nation rollup.
    // Exercises the stream-capable sessionizer, a broadcast dim join,
    // and exact-decimal aggregation in one flow.
    "pipeline_e2e" -> Q(
      (s, dir) => {
        val sessions = graft.streaming.Sessionize.batch(Tables.events(s, dir))
        val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, dir)
        sessions
          .join(broadcast(c), col("user_id") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("n_events"),
            dsum(col("session_value")).as("total_value"))
          .orderBy("n_name")
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
          SELECT user_id, value,
                 CAST(sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts_us ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_seq
          FROM gaps
        ), per_session AS (
          SELECT user_id, session_seq, count(*) AS n_ev,
                 ${S.dsum("value")} AS session_value
          FROM sessions GROUP BY user_id, session_seq)
        SELECT n_name, count(*) AS n_sessions,
               CAST(sum(n_ev) AS BIGINT) AS n_events,
               ${S.dsum("session_value")} AS total_value
        FROM per_session
        JOIN customer ON user_id = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ------------------------------------------------------------------
    // Fact-fact join on bucketed twins: both sides pre-bucketed by the
    // join key, so the join itself needs no shuffle (BucketingSpec
    // asserts the exchange-free plan). Result oracled against the
    // plain tables.
    "q_bucketed_join" -> Q(
      (s, dir) => {
        val (ot, lt) = Bucketing.ensureOrdersLineitem(s, dir)
        s.table(ot).join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderstatus", "l_returnflag")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .orderBy("o_orderstatus", "l_returnflag")
      },
      Some(s"""
        SELECT o_orderstatus, l_returnflag, count(*) AS n,
               ${S.dsum("l_quantity")} AS qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2 ORDER BY o_orderstatus, l_returnflag"""))
  )
}
