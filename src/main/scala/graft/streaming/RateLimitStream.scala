package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of batch q112's trailing-window rate-limit audit —
  * quota enforcement at ingest: per user, flag every event whose
  * trailing `windowSec` count exceeds `maxEvents`, emitting flags in
  * append mode as soon as the watermark seals them.
  *
  * RANGE-frame parity is the subtle part: batch q112's frame counts
  * ALL events in the same second (peers), including ones that sort
  * after the current row — so a second is only evaluable when no
  * further arrival can land in it. Events therefore buffer until
  * their WHOLE SECOND clears the watermark ((es+1)*1000 <= wm), then
  * fold per distinct second: every event in second es sees the same
  * count n = |sealed events in (es - windowSec, es]|, exactly the
  * batch RANGE frame.
  *
  * STATE BOUND at 100 TB/day: per user, the sealed-event seconds
  * inside the trailing window (O(window occupancy) — the quota itself
  * bounds the interesting case) plus the in-horizon arrival buffer
  * the watermark drains every batch. Unlike SessionStream there is NO
  * lifetime register: a user idle past window + horizon is removed
  * from the store entirely by their own event-time timeout
  * (suite-asserted), so steady-state store size tracks ACTIVE users
  * only.
  */
object RateLimitStream {

  final case class EventIn(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long)
  /** The batch q112 row shape. */
  final case class FlagOut(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, n_window: Long)

  final case class BufEvent(ts: java.sql.Timestamp, event_id: Long)
  /** `recent`: sealed event seconds (with multiplicity), pruned to the
    * trailing window of the newest sealed second. */
  final case class UserState(recent: Vector[Long], buffer: Vector[BufEvent])

  private def es(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L)

  /** Audit a streaming (user_id, ts, event_id) frame. */
  def flags(events: DataFrame, windowSec: Long, maxEvents: Long,
      watermark: String = "10 minutes"): Dataset[FlagOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(foldGroup(windowSec, maxEvents))
  }

  private def foldGroup(windowSec: Long, maxEvents: Long)(user: Long,
      rows: Iterator[EventIn], state: GroupState[UserState])
      : Iterator[FlagOut] = {
    val prior = state.getOption.getOrElse(UserState(Vector.empty, Vector.empty))
    val buffered = prior.buffer ++ rows.map(e => BufEvent(e.ts, e.event_id))
    val wm = state.getCurrentWatermarkMs()
    // a second is complete only when the watermark clears its END —
    // same-second stragglers are RANGE peers in the batch frame
    val (ready, pending) = buffered.partition(e => (es(e.ts) + 1) * 1000L <= wm)
    var recent = prior.recent
    val out = Vector.newBuilder[FlagOut]
    ready.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      .groupBy(e => es(e.ts)).toSeq.sortBy(_._1)
      .foreach { case (sec, evs) =>
        // batch RANGE `windowSec PRECEDING` includes the boundary second
        recent = (recent ++ evs.map(_ => sec))
          .filter(s => s >= sec - windowSec && s <= sec)
        val n = recent.size.toLong
        if (n > maxEvents) evs.foreach(e =>
          out += FlagOut(user, e.event_id, e.ts, n))
      }
    if (pending.isEmpty
      && recent.forall(s => (s + windowSec + 1) * 1000L <= wm)) {
      // nothing buffered and every retained second has aged out of any
      // future event's trailing window: drop the key entirely
      state.remove()
    } else {
      state.update(UserState(recent, pending))
      val wakes = pending.map(e => (es(e.ts) + 1) * 1000L) ++
        (if (pending.isEmpty) recent.map(s => (s + windowSec + 1) * 1000L)
         else Vector.empty)
      state.setTimeoutTimestamp(math.max(wakes.min, wm + 1))
    }
    out.result().iterator
  }
}
