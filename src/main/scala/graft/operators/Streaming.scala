package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import graft.streaming.{Sessionize, Upsert}
import org.apache.spark.sql.functions._

/** Group I of SURVEY.md §2 — streaming operators, registered through
  * their batch-equivalent results (the driver's oracle is a batch
  * engine). The genuinely-streaming execution of each operator —
  * readStream source, watermarks, state eviction — runs in
  * StreamingSpec and must produce the same rows as the batch path.
  */
object Streaming {

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Tumbling-window aggregation: batch window() here; the streaming
    // spec runs the identical plan over readStream + watermark.
    "stream_window_agg" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
          .select(col("window.start").as("window_start"), col("event_type"),
            col("n_events"), col("total_value"))
          .orderBy("window_start", "event_type")
      },
      Some(s"""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, ${S.dsum("value")} AS total_value
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // ------------------------------------------------------------------
    // Keyed CDC upsert: the continuously-maintained latest-row-per-key
    // view (streaming analog of ch_replacing_mt; the state every
    // CDC-fed serving table keeps). Batch and streaming run the SAME
    // O(1)-per-key fold (graft.streaming.Upsert — latest wins by
    // (ts_us, event_id), versions counted); the streaming twin in
    // StreamingSpec folds micro-batch slices into GroupState and
    // emits update-mode upserts, converging to the identical
    // snapshot. State is one small row per live key; the only
    // shuffle is the key exchange.
    "stream_cdc_upsert" -> Q(
      (s, dir) => Upsert.batch(Tables.events(s, dir)).orderBy("user_id"),
      Some("""
        WITH r AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS nv
          FROM events)
        SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
               event_type AS last_event_type, value AS last_value,
               CAST(nv AS BIGINT) AS n_versions
        FROM r WHERE rn = 1 ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // Windowed t-digest quantiles: the streaming-sketch family's
    // quantile member (beside stream_kmv_uniq and stream_topk) — per
    // (hour window, event_type), bounded-error p50/p90 over the value
    // stream from O(compression) mergeable state, the shape a
    // continuously-maintained latency/percentile dashboard keeps.
    // Estimates are merge-order-dependent, so the oracle is the rank
    // CERTIFICATE (ch_quantile_tdigest's device) re-ranked per window;
    // the eps adds +2 absolute slack because tiny windows are in the
    // sketch's exact regime where the midpoint rule can still sit one
    // rank off a fat tie interval. StreamingSpec runs the identical
    // aggregate over readStream + watermark and re-checks the bound.
    "stream_tdigest" -> Q(
      (s, dir) => {
        val qs = Seq(0.5, 0.9)
        val ev = Tables.events(s, dir)
          .withColumn("ws_us", unix_micros(window(col("ts"), "1 hour")("start")))
        val est = ev.groupBy("ws_us", "event_type")
          .agg(graft.functions.TDigestSketch(200, qs, col("value")).as("est"))
        def ok(i: Int, q: Double) = {
          val e = col("est").getItem(i)
          val n = count(lit(1))
          val eps = lit(0.02) * n + lit(2.0)
          ((count_if(col("value") < e) <= lit(q) * n + eps) &&
            (count_if(col("value") <= e) >= lit(q) * n - eps))
            .as(s"q${(q * 100).toInt}_rank_ok")
        }
        ev.join(broadcast(est), Seq("ws_us", "event_type"))
          .groupBy("ws_us", "event_type")
          .agg(count(lit(1)).as("n_rows"), ok(0, 0.5), ok(1, 0.9))
          .orderBy("ws_us", "event_type")
      },
      Some("""
        SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS q50_rank_ok, TRUE AS q90_rank_ok
        FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type"""),
      benchFn = Some((s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(graft.functions.TDigestSketch(200, Seq(0.5, 0.9),
            col("value")).as("est"))
          .select(unix_micros(col("window.start")).as("ws_us"),
            col("event_type"), posexplode(col("est")).as(Seq("qi", "estimate"))))),

    // ------------------------------------------------------------------
    // Dedup-by-id: the input is doubled (union all) and deduplicated
    // on event_id — the streaming twin uses dropDuplicates within a
    // watermark.
    "stream_dedup" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir).select("event_id", "event_type", "value")
        e.union(e)
          .dropDuplicates("event_id")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .orderBy("event_type")
      },
      Some(s"""
        SELECT event_type, count(*) AS n, ${S.dsum("value")} AS total
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // Sessionization through the stateful flatMapGroupsWithState core
    // (same code the streaming job runs); oracle identical to the
    // window-function q_sessionize.
    "stream_session" -> Q(
      (s, dir) => Sessionize.batch(Tables.events(s, dir))
        .orderBy("user_id", "session_seq"),
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
    // Stream-stream INTERVAL join (view -> click attribution within
    // one hour, per user): the batch twin is an equi-join on user_id
    // with a time-range predicate — one shuffle on the join key, the
    // range condition applied post-join, which is exactly how the
    // streaming symmetric hash join evaluates it. The streaming twin
    // in StreamingSpec runs two readStreams with watermarks and the
    // same interval condition, which bounds both join states.
    "stream_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts_us").as("view_us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            col("ts_us").as("click_us"))
        views.join(clicks,
            col("user_id") === col("c_user") &&
              col("click_us") >= col("view_us") &&
              col("click_us") < col("view_us") + lit(3600000000L))
          .select(col("user_id"), col("view_id"), col("click_id"),
            col("view_us"), col("click_us"))
          .orderBy("user_id", "view_id", "click_id")
      },
      Some("""
        SELECT v.user_id, v.view_id, c.click_id, v.view_us, c.click_us
        FROM (SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
              FROM events WHERE event_type = 'view') v
        JOIN (SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
              FROM events WHERE event_type = 'click') c
          ON v.user_id = c.user_id
         AND c.click_us >= v.view_us
         AND c.click_us < v.view_us + 3600000000
        ORDER BY v.user_id, v.view_id, c.click_id""")),

    // ------------------------------------------------------------------
    // Distinct users per hourly window. The streaming twin
    // (StreamingSpec) is dropDuplicates on (window-hour, user) within
    // the watermark followed by the windowed count — the standard
    // exact-distinct streaming composition whose state is one row per
    // (window, user), evicted by the watermark; this batch twin is
    // the same two-step shape collapsed into one distinct aggregate.
    "stream_uniq_window" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"))
          .agg(countDistinct(col("user_id")).as("uniq_users"),
            count(lit(1)).as("n_events"))
          .select(col("window.start").as("window_start"),
            col("uniq_users"), col("n_events"))
          .orderBy("window_start")
      },
      Some("""
        SELECT date_trunc('hour', ts) AS window_start,
               count(DISTINCT user_id) AS uniq_users, count(*) AS n_events
        FROM events GROUP BY 1 ORDER BY window_start""")),

    // ------------------------------------------------------------------
    // Sliding (hopping) window: 1-hour windows every 15 minutes, so
    // each event lands in 4 windows. Spark's window() replicates the
    // row per overlapping window BEFORE the aggregation — the same
    // explode the oracle does with a literal offset array. Streaming
    // twin is the identical plan over readStream + watermark.
    "stream_sliding_window" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
          .select(unix_micros(col("window.start")).as("ws_us"),
            col("event_type"), col("n_events"), col("total_value"))
          .orderBy("ws_us", "event_type")
      },
      Some(s"""
        SELECT epoch_us(time_bucket(INTERVAL 15 MINUTE, ts)
                 - INTERVAL 15 MINUTE * off) AS ws_us,
               event_type, count(*) AS n_events,
               ${S.dsum("value")} AS total_value
        FROM events, unnest([0, 1, 2, 3]) AS t(off)
        GROUP BY 1, 2 ORDER BY ws_us, event_type""")),

    // ------------------------------------------------------------------
    // Native session windows (session_window()): per-user sessions
    // closed by a 30-minute silence gap; the window end extends to
    // last event + gap (Spark's session semantics). Same sessions as
    // the flatMapGroupsWithState sessionizer and the window-function
    // q_sessionize, through the engine-native operator that also runs
    // under readStream with merging session state.
    "stream_session_native" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            unix_micros(col("session_window.end")).as("session_end_us"),
            col("n_events"), col("total_value"))
          .orderBy("user_id", "session_start_us")
      },
      Some(s"""
        WITH gaps AS (
          SELECT user_id, ts, value,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts)
                        > CAST(1800000000 AS BIGINT)
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        IS NULL
                 THEN 1 ELSE 0 END AS new_session
          FROM events),
        sess AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM gaps)
        SELECT user_id, epoch_us(min(ts)) AS session_start_us,
               epoch_us(max(ts)) + CAST(1800000000 AS BIGINT)
                 AS session_end_us,
               count(*) AS n_events, ${S.dsum("value")} AS total_value
        FROM sess GROUP BY user_id, session_seq
        ORDER BY user_id, session_start_us""")),

    // ------------------------------------------------------------------
    // Sketch-in-stream: approximate distinct users per hour via the
    // KMV aggregate — unlike stream_uniq_window's exact composition
    // (state = one row per (window, user)), the sketch holds a FIXED
    // 32 KB per window however many users arrive: the streaming
    // answer when per-window cardinality outgrows the state store.
    // k=4096 keeps it exact at verification scale (hence the DuckDB
    // oracle); StreamingSpec runs the same aggregate over a genuine
    // readStream and must match this batch twin.
    "stream_kmv_uniq" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"))
          .agg(graft.functions.Kmv(4096, xxhash64(col("user_id")))
            .as("approx_uniq"))
          .select(col("window.start").as("window_start"), col("approx_uniq"))
          .orderBy("window_start")
      },
      Some("""
        SELECT date_trunc('hour', ts) AS window_start,
               count(DISTINCT user_id) AS approx_uniq
        FROM events GROUP BY 1 ORDER BY window_start""")),

    // ------------------------------------------------------------------
    // Space-saving top-k inside a (streamable) windowed aggregation:
    // per hour, the 3 heaviest event types from a capacity-64 sketch —
    // bounded state per window whatever the type cardinality, the
    // heavy-hitter companion to stream_kmv_uniq's distinct sketch.
    // Exact below capacity (5 types here), hence the plain GROUP BY
    // count oracle; StreamingSpec runs the same aggregate through a
    // genuine readStream.
    "stream_topk" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"))
          .agg(graft.functions.SpaceSaving.topk(64, 3, col("event_type"))
            .as("top"))
          .select(col("window.start").as("window_start"),
            posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("window_start"),
            (col("pos") + 1).cast("int").as("rank"),
            col("t._1").as("event_type"), col("t._2").as("cnt"))
          .orderBy("window_start", "rank")
      },
      Some("""
        WITH c AS (
          SELECT date_trunc('hour', ts) AS ws, event_type,
                 count(*) AS cnt
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT ws, event_type, cnt,
                 CAST(row_number() OVER (PARTITION BY ws
                   ORDER BY cnt DESC, event_type) AS INTEGER) AS rank
          FROM c)
        SELECT ws AS window_start, rank, event_type,
               CAST(cnt AS BIGINT) AS cnt
        FROM r WHERE rank <= 3 ORDER BY window_start, rank"""))
  )
}
