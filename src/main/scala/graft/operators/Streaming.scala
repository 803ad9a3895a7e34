package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import graft.streaming.Sessionize
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
        ORDER BY user_id, session_seq"""))
  )
}
