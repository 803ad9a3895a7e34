package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization shared by the batch and streaming paths.
  *
  * State is one open session per user — O(1) per key, evicted by
  * event-time timeout in streaming. The same
  * `flatMapGroupsWithState` function runs in batch mode (Spark feeds
  * each group once, no timeouts), which is how the driver's oracle
  * checks it: batch output must equal the window-function
  * formulation (q_sessionize).
  */
object Sessionize {

  val GapUs: Long = 1800L * 1000000L // 30 min session gap

  /** `ts` (the event-time column the watermark rides on) must be a
    * consumed field, or column pruning strips it before the
    * event-time-timeout check sees it.
    */
  case class Ev(user_id: Long, event_id: Long, ts_us: Long, value: Double,
      ts: java.sql.Timestamp)
  case class OpenSession(
      seq: Long, startUs: Long, endUs: Long, n: Long, value: BigDecimal)
  case class SessionOut(
      user_id: Long, session_seq: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, session_value: Double)

  /** Emits every session of the group's (sorted) new events; keeps the
    * still-open session in state. In batch mode each group arrives
    * exactly once, so the final open session is flushed immediately.
    */
  /** How long a CLOSED session's sequence counter stays in state so a
    * user's next session continues the numbering. At real scale this
    * is the state-retention policy (memory is O(active users) either
    * way); here it outlives the test data's time range.
    */
  val SeqRetentionMs: Long = 40L * 24 * 3600 * 1000

  def fn(flushOpen: Boolean)(
      userId: Long, rows: Iterator[Ev], state: GroupState[OpenSession])
      : Iterator[SessionOut] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
    // n == 0 marks a closed-session marker: no open session, but the
    // seq counter must carry over.
    val prior = state.getOption
    var open = prior.filter(_.n > 0)
    val seqBase = prior.map(_.seq).getOrElse(0L)
    val out = Seq.newBuilder[SessionOut]
    def close(s: OpenSession): Unit =
      out += SessionOut(userId, s.seq, s.startUs, s.endUs, s.n, s.value.toDouble)
    for (e <- sorted) {
      open match {
        case Some(s) if e.ts_us - s.endUs <= GapUs =>
          open = Some(s.copy(endUs = e.ts_us, n = s.n + 1,
            value = s.value + BigDecimal(e.value).setScale(4)))
        case Some(s) =>
          close(s)
          open = Some(OpenSession(s.seq + 1, e.ts_us, e.ts_us, 1,
            BigDecimal(e.value).setScale(4)))
        case None =>
          open = Some(OpenSession(seqBase + 1, e.ts_us, e.ts_us, 1,
            BigDecimal(e.value).setScale(4)))
      }
    }
    open match {
      case Some(s) if flushOpen =>
        close(s); state.remove()
      case Some(s) =>
        val due = s.endUs / 1000L + GapUs / 1000L
        val wm = state.getCurrentWatermarkMs()
        if (wm > 0L && due <= wm) {
          // gap already passed (late group or timeout firing): emit,
          // keep the seq counter as a closed marker
          close(s)
          state.update(s.copy(n = 0, value = BigDecimal(0)))
          state.setTimeoutTimestamp(wm + SeqRetentionMs)
        } else {
          state.update(s)
          // a timeout in the past is rejected; clamp to watermark+1
          state.setTimeoutTimestamp(math.max(due, wm + 1L))
        }
      case None =>
        prior match {
          case Some(m) if !flushOpen && !state.hasTimedOut =>
            // closed marker untouched this batch; keep it alive
            state.update(m.copy(n = 0, value = BigDecimal(0)))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + SeqRetentionMs)
          case _ => if (state.exists) state.remove()
        }
    }
    out.result().iterator
  }

  /** Batch sessionization through the same stateful function. */
  def batch(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.select("user_id", "event_id", "ts_us", "value", "ts").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        fn(flushOpen = true))
      .toDF()
  }

  /** Streaming sessionization with event-time timeout eviction. */
  def streaming(events: Dataset[Ev]): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn(flushOpen = false))
      .toDF()
  }
}
