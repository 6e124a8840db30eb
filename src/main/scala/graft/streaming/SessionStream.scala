package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of batch q103 sessionization — session ASSIGNMENT at
  * ingest: per user, group arrivals into gap-bounded sessions and EMIT
  * EACH SESSION ROW THE MOMENT THE WATERMARK PROVES IT CLOSED (no
  * arrival at or above the watermark can extend it), in append mode.
  *
  * The part batch gets free from its sort is the bridge case: two
  * provisional bursts either side of a gap are ONE session if a late
  * (but in-horizon) arrival lands between them — so arrivals buffer in
  * state until the watermark passes them, and only the sealed prefix
  * folds through the same gap logic as batch q103, in the same
  * (ts, event_id) total order (SessionStreamSpec pins the bridge).
  *
  * Unlike Scd2Stream's is_current register, an idle session DOES reach
  * a final state on its own: once the watermark clears end + gap the
  * session can never be extended, so an event-time timeout fires and
  * emits it. Total emission therefore equals the FULL batch q103 row
  * set once the watermark passes every user's horizon — set equality
  * on the real corpus is suite-asserted, not "minus the open tail".
  *
  * STATE BOUND at 100 TB/day: per user, ONE open-session summary
  * (session_n counter, start, end, n_events — constant size) plus the
  * in-horizon arrival buffer the watermark drains every batch —
  * O(events-per-user-per-horizon), NOT O(stream length); a user idle
  * past end + gap shrinks to the bare lifetime session counter (the
  * price of q103's whole-history session_n numbering — see foldGroup).
  *
  * Gap semantics are byte-identical to batch q103: whole-second floors
  * (es = floor(ts / 1 s)), new session when es - prev_es > gapSec,
  * duration_sec = es(end) - es(start).
  */
object SessionStream {

  final case class EventIn(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long)
  /** The batch q103 row shape. */
  final case class SessionOut(user_id: Long, session_n: Long,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp,
      n_events: Long, duration_sec: Long)

  final case class OpenSession(n: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, nEvents: Long)
  final case class BufEvent(ts: java.sql.Timestamp, event_id: Long)
  final case class UserState(open: Option[OpenSession], nClosed: Long,
      buffer: Vector[BufEvent])

  /** Whole-second floor, identical to the batch timestamp->long cast
    * (millis and micros truncate the same way for positive epochs). */
  private def es(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L)

  /** Micro-precision total order (see Scd2Stream.orderKey). */
  private def orderKey(ts: java.sql.Timestamp, id: Long): (Long, Int, Long) =
    (ts.getTime, ts.getNanos, id)

  /** Sessionize a streaming (user_id, ts, event_id) frame. `gapSec` is
    * the batch q103 idle threshold; `watermark` bounds lateness and the
    * arrival-buffer horizon. */
  def sessions(events: DataFrame, gapSec: Long,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(foldGroup(gapSec))
  }

  private def foldGroup(gapSec: Long)(user: Long, rows: Iterator[EventIn],
      state: GroupState[UserState]): Iterator[SessionOut] = {
    val prior = state.getOption.getOrElse(UserState(None, 0L, Vector.empty))
    val buffered = prior.buffer ++ rows.map(e => BufEvent(e.ts, e.event_id))
    val wm = state.getCurrentWatermarkMs()
    // Strict seal: the watermark only guarantees no future arrival with
    // ts < wm — a same-millisecond peer at ts == wm can still arrive —
    // so events at exactly wm stay buffered until the watermark passes.
    val (ready, pending) = buffered.partition(_.ts.getTime < wm)
    var open = prior.open
    var nClosed = prior.nClosed
    val out = Vector.newBuilder[SessionOut]
    def emit(s: OpenSession): Unit = {
      out += SessionOut(user, s.n, s.start, s.end, s.nEvents,
        es(s.end) - es(s.start))
      nClosed = s.n
    }
    ready.sortBy(e => orderKey(e.ts, e.event_id)).foreach { e =>
      open match {
        case Some(s) if es(e.ts) - es(s.end) <= gapSec =>
          open = Some(s.copy(end = e.ts, nEvents = s.nEvents + 1))
        case Some(s) =>
          emit(s)
          open = Some(OpenSession(s.n + 1, e.ts, e.ts, 1L))
        case None =>
          open = Some(OpenSession(nClosed + 1, e.ts, e.ts, 1L))
      }
    }
    // a sealed-open session whose extension window the watermark has
    // cleared can never grow: every future arrival has ts >= wm, hence
    // es >= floor(wm/1000) > es(end) + gap. Emit and free the key.
    open match {
      case Some(s) if Math.floorDiv(wm, 1000L) > es(s.end) + gapSec =>
        emit(s)
        open = None
      case _ =>
    }
    // The nClosed counter is LIFETIME state — q103's session_n numbers a
    // user's sessions across their whole history, so an idle user keeps
    // a constant-size counter register (never the buffer). If a
    // deployment can re-key numbering per epoch, swap this update for
    // state.remove() and session_n resets with the epoch.
    state.update(UserState(open, nClosed, pending))
    if (pending.nonEmpty || open.nonEmpty) {
      // wake at whichever comes first: the earliest pending arrival
      // becoming sealable, or the open session's extension window
      // expiring (timeouts must sit strictly above the watermark)
      val wakes = pending.map(_.ts.getTime) ++
        open.map(s => (es(s.end) + gapSec + 1) * 1000L)
      state.setTimeoutTimestamp(math.max(wakes.min, wm + 1))
    }
    out.result().iterator
  }
}
