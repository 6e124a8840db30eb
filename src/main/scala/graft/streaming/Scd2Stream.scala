package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch q80 SCD2 history build — change-data
  * capture at ingest: per user, collapse the event_type stream into
  * validity intervals and EMIT EACH INTERVAL THE MOMENT IT CLOSES
  * (append mode), while the open segment rides in keyed state exactly
  * like the batch result's is_current row.
  *
  * Out-of-order handling is the part batch gets for free from its sort:
  * here arrivals buffer in state until the watermark passes them —
  * only then is their relative order final — and the SEALED prefix
  * (ts <= current watermark) folds through the same
  * change-flag/segment logic as batch q80, in the same (ts, event_id)
  * total order. Emitted closed intervals therefore equal the batch
  * operator's valid_to-non-null rows bit for bit (Scd2StreamSpec
  * asserts set equality on the real corpus).
  *
  * STATE BOUND (what matters at 100 TB/day): per user, ONE open-segment
  * summary (type, valid_from, last_seen, n_events — constant size, the
  * stream-long memory SCD2 semantically requires, one entry per active
  * user exactly like the batch is_current row set) plus the
  * in-horizon arrival buffer, which the watermark drains every batch —
  * O(events-per-user-per-horizon), NOT O(stream length). A user idle
  * past the horizon costs only the constant open-segment entry.
  *
  * Divergences from batch q80, both inherent to streaming: the open
  * segment is state rather than an emitted is_current row (append mode
  * cannot retract it), and closure emission is delayed by the
  * watermark horizon.
  */
object Scd2Stream {

  final case class EventIn(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)
  /** A closed validity interval — the batch q80 row shape minus the
    * always-false is_current. */
  final case class SegOut(user_id: Long, event_type: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp,
      last_seen: java.sql.Timestamp, n_events: Long)

  // Timestamps are kept as java.sql.Timestamp END TO END: epoch-millis
  // longs would silently truncate the micros the source carries, and
  // batch parity is asserted at full precision.
  final case class OpenSeg(eventType: String, from: java.sql.Timestamp,
      lastSeen: java.sql.Timestamp, nEvents: Long)
  final case class BufEvent(ts: java.sql.Timestamp, event_id: Long,
      eventType: String)
  final case class UserState(open: Option[OpenSeg], buffer: Vector[BufEvent])

  /** Micro-precision total order (getTime alone collapses same-ms
    * events; nanos disambiguate, event_id breaks exact ties). */
  private def orderKey(ts: java.sql.Timestamp, id: Long): (Long, Int, Long) =
    (ts.getTime, ts.getNanos, id)

  /** Collapse a streaming (user_id, ts, event_id, event_type) frame
    * into closed SCD2 intervals. `watermark` bounds both lateness and
    * the arrival-buffer horizon. */
  def intervals(events: DataFrame, watermark: String = "10 minutes")
      : Dataset[SegOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"), col("event_type"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        foldGroup)
  }

  private def foldGroup(user: Long, rows: Iterator[EventIn],
      state: GroupState[UserState]): Iterator[SegOut] = {
    val prior = state.getOption.getOrElse(UserState(None, Vector.empty))
    // state.hasTimedOut carries no arrivals; a data invocation appends.
    // Either way the sealing pass below is the same code path.
    val buffered = prior.buffer ++ rows.map(e =>
      BufEvent(e.ts, e.event_id, e.event_type))
    val wm = state.getCurrentWatermarkMs()
    // The watermark guarantees no future arrival with ts < wm — an event
    // at ts == wm can still legally arrive in a later batch — so only the
    // STRICT prefix (ts < wm) has FINAL relative order: fold those
    // through the segment logic in the batch operator's (ts, event_id)
    // total order; keep the rest (including ts == wm) buffered.
    val (ready, pending) = buffered.partition(_.ts.getTime < wm)
    var open = prior.open
    val out = Vector.newBuilder[SegOut]
    ready.sortBy(e => orderKey(e.ts, e.event_id)).foreach { e =>
      open match {
        case Some(seg) if seg.eventType == e.eventType =>
          open = Some(seg.copy(lastSeen = e.ts, nEvents = seg.nEvents + 1))
        case Some(seg) =>
          out += SegOut(user, seg.eventType, seg.from, e.ts,
            seg.lastSeen, seg.nEvents)
          open = Some(OpenSeg(e.eventType, e.ts, e.ts, 1L))
        case None =>
          open = Some(OpenSeg(e.eventType, e.ts, e.ts, 1L))
      }
    }
    state.update(UserState(open, pending))
    if (pending.nonEmpty) {
      // wake when the watermark can seal the earliest pending arrival
      // (timeout timestamps must sit above the current watermark)
      state.setTimeoutTimestamp(math.max(pending.map(_.ts.getTime).min, wm + 1))
    }
    // no pending buffer: the open segment needs no wake-up — it closes
    // (or grows) only when a new arrival for this user shows up, and
    // persists as the is_current row otherwise
    out.result().iterator
  }
}
