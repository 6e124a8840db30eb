package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Event-time streaming operators over the events stream shape
  * (event_id, ts, user_id, event_type, value): watermarked tumbling /
  * sliding / session windows, plus a custom stateful sessionizer on
  * flatMapGroupsWithState. The reference has no event-time logic at all
  * (SURVEY.md §2.2 'absent'); these are the north-star capabilities, and
  * their batch twins (q24-q26) are what the DuckDB oracle verifies.
  */
object EventStreams {

  /** Tumbling 1-hour counts/sums with a watermark bounding state. */
  def tumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour/30-minute windows. */
  def sliding(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"), col("sum_value"))

  /** Session windows (5-minute gap) per user. */
  def sessions(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  // ------------------------------------------------------------------
  // Custom state machine: flatMapGroupsWithState sessionizer (the
  // strictly-stronger replacement for the reference's per-worker mutable
  // buffer state, /root/reference/etl/main.go:80-83 — checkpointed,
  // per-key, timeout-driven).

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, totalValue: Double)
  final case class SessionSummary(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Emit a SessionSummary when a user goes quiet for `gapMillis`
    * (processing-time timeout variant, suitable for live streams). */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(
              userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            if (sorted.nonEmpty) {
              val prev = state.getOption
              val merged = sorted.foldLeft(prev.getOrElse(
                SessionState(sorted.head.ts.getTime, sorted.head.ts.getTime, 0, 0.0))) {
                (st, e) => SessionState(
                  math.min(st.start, e.ts.getTime), math.max(st.end, e.ts.getTime),
                  st.n + 1, st.totalValue + e.value)
              }
              state.update(merged)
              state.setTimeoutDuration(gapMillis)
            }
            Iterator.empty
          }
      }
  }
}
