package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed CDC upsert — the continuously-maintained "latest row per
  * key" materialized view (the streaming analog of ch_replacing_mt,
  * and the state every CDC-fed serving table keeps). Shared by the
  * batch and streaming paths: both run the same O(1) per-key fold
  * (keep the row with the max (ts_us, event_id), count versions);
  * batch folds each key's full group once, streaming folds each
  * micro-batch's slice into GroupState and re-emits the key's current
  * row (update mode — downstream sees one upsert per changed key per
  * batch, never a retraction).
  *
  * Scale shape: state is ONE small row per live key (O(keys), the
  * same bound ch_replacing_mt's FINAL pays at read time, paid here
  * incrementally); the only shuffle is the groupByKey hash exchange;
  * nothing buffers a key's history — the fold is streaming-safe by
  * construction (max and count are commutative over batch slices).
  */
object Upsert {

  /** `ts` must stay a consumed field in streaming (watermark column —
    * pruning would strip it before the state layer sees it).
    */
  case class Ev(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String, value: Double, ts: java.sql.Timestamp)
  case class KeyState(ts_us: Long, event_id: Long, event_type: String,
      value: Double, n_versions: Long)
  case class OutRow(user_id: Long, last_ts_us: Long, last_event_id: Long,
      last_event_type: String, last_value: Double, n_versions: Long)

  /** (latest wins by (ts_us, event_id) — the deterministic version
    * order; counts every version seen).
    */
  private def merge(st: Option[KeyState], rows: Iterator[Ev]): KeyState = {
    var cur = st.orNull
    for (e <- rows) {
      cur =
        if (cur == null || e.ts_us > cur.ts_us ||
          (e.ts_us == cur.ts_us && e.event_id > cur.event_id))
          KeyState(e.ts_us, e.event_id, e.event_type, e.value,
            (if (cur == null) 0L else cur.n_versions) + 1L)
        else cur.copy(n_versions = cur.n_versions + 1L)
    }
    cur
  }

  private def out(key: Long, st: KeyState): OutRow =
    OutRow(key, st.ts_us, st.event_id, st.event_type, st.value, st.n_versions)

  /** The streaming fold: merge this micro-batch's slice into the
    * key's state and emit the key's CURRENT row (empty iterator only
    * on a pure timeout tick, which this job never schedules).
    */
  def fn(key: Long, rows: Iterator[Ev], state: GroupState[KeyState])
      : Iterator[OutRow] = {
    if (!rows.hasNext) return Iterator.empty
    val st = merge(state.getOption, rows)
    state.update(st)
    Iterator.single(out(key, st))
  }

  private def evs(events: DataFrame): Dataset[Ev] = {
    val s = events.sparkSession
    import s.implicits._
    events.select(col("user_id"), col("event_id"), col("ts_us"),
      col("event_type"), col("value"), col("ts")).as[Ev]
  }

  /** Batch path: one fold per key over the shuffled group. */
  def batch(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    evs(events).groupByKey(_.user_id)
      .mapGroups((k, rows) => out(k, merge(None, rows)))
      .toDF()
  }

  /** Streaming path: update-mode upserts per micro-batch. */
  def stream(events: Dataset[Ev]): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }
}
