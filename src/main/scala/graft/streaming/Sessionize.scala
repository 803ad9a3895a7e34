package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization shared by the batch and streaming paths.
  *
  * State is one open session per user — O(1) per key, evicted by
  * event-time timeout in streaming. Both paths run the same O(1)
  * session fold over time-ordered events; they differ only in where
  * the ordering comes from: batch gets it from Spark's spillable
  * shuffle sort (`flatMapSortedGroups`), streaming sorts each
  * micro-batch's slice of the group (bounded by micro-batch size,
  * not by a user's full history). The driver's oracle checks the
  * batch output against the window-function formulation
  * (q_sessionize).
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
    // per-micro-batch slice of one key — bounded by the batch, not by
    // the user's history, so sorting in heap is safe here
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
        case Some(s) if e.ts_us < s.startUs - GapUs =>
          // Beyond the mergeable horizon: in batch order this event
          // would belong to a SEPARATE session that closed before the
          // open one, which O(1) single-session state cannot renumber
          // retroactively. Dropping it is the bounded-state trade-off
          // (production: widen the watermark so such events are
          // excluded upstream, or keep multi-session state). Merging
          // it — the old behavior — silently glued two sessions that
          // the batch path reports separately.
          ()
        case Some(s) if e.ts_us - s.endUs <= GapUs =>
          // min/max, not assignment: a late event from a LATER
          // micro-batch (within the watermark) can be older than the
          // restored session's bounds, and must not move them backwards
          open = Some(s.copy(startUs = math.min(s.startUs, e.ts_us),
            endUs = math.max(s.endUs, e.ts_us), n = s.n + 1,
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

  /** One streaming pass over a user's time-sorted events: O(1) state,
    * sessions emitted as soon as they close. Used by the batch path,
    * where Spark's shuffle sort (flatMapSortedGroups) provides the
    * ordering — a power user's full history is never materialized in
    * heap, unlike a toSeq.sortBy of the group.
    */
  def sortedIter(userId: Long, rows: Iterator[Ev]): Iterator[SessionOut] =
    new Iterator[SessionOut] {
      private var open: Option[OpenSession] = None
      private var pending: Option[SessionOut] = None
      private var flushed = false
      private def emit(s: OpenSession): SessionOut =
        SessionOut(userId, s.seq, s.startUs, s.endUs, s.n, s.value.toDouble)
      private def advance(): Unit = {
        while (pending.isEmpty && rows.hasNext) {
          val e = rows.next()
          val v = BigDecimal(e.value).setScale(4)
          open = open match {
            case Some(s) if e.ts_us - s.endUs <= GapUs =>
              Some(s.copy(endUs = math.max(s.endUs, e.ts_us), n = s.n + 1,
                value = s.value + v))
            case Some(s) =>
              pending = Some(emit(s))
              Some(OpenSession(s.seq + 1, e.ts_us, e.ts_us, 1, v))
            case None =>
              Some(OpenSession(1L, e.ts_us, e.ts_us, 1, v))
          }
        }
        if (pending.isEmpty && !rows.hasNext && !flushed) {
          flushed = true
          pending = open.map(emit)
          open = None
        }
      }
      override def hasNext: Boolean = { advance(); pending.nonEmpty }
      override def next(): SessionOut = {
        advance(); val r = pending.get; pending = None; r
      }
    }

  /** Batch sessionization: shuffle-sorted groups + the O(1) streaming
    * fold — the sort happens in Spark's spillable shuffle machinery,
    * not in task heap.
    */
  def batch(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.select("user_id", "event_id", "ts_us", "value", "ts").as[Ev]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts_us"), col("event_id"))(
        (k, rows) => sortedIter(k, rows))
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
