package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of batch q129 last-touch attribution — conversion
  * credit assigned at ingest: per user, every purchase is credited to
  * the most recent click/view at-or-before it within the attribution
  * window, emitted once the watermark seals the purchase's position in
  * the stream. Composition mirrors the batch operator stage for stage:
  *
  *   batch q129                          this stream
  *   --------------------------------    -------------------------------
  *   same-(user, ts) touch dedup by      same rule, inside the sealed
  *   max event_id                        fold (later event_id replaces)
  *   as-of union + user window           keyed state: the user's latest
  *                                       sealed touch
  *   7-day window + epoch-floor gap      identical integer-micros test
  *
  * Out-of-order handling is the [[Scd2Stream]] discipline verbatim:
  * arrivals buffer in keyed state until the STRICT watermark prefix
  * (ts < wm) has final relative order, then fold in (ts, nanos,
  * touches-first, event_id) total order. The type rank at equal
  * timestamps is the batch-parity keystone (round-9 fix of an advisor
  * finding): batch q129's as-of credits every touch with t.ts <= p.ts
  * — INCLUDING a same-timestamp touch whose event_id is smaller OR
  * larger than the purchase's — so the fold must absorb all
  * at-or-before touches into state before attributing any same-ts
  * purchase. A plain (ts, nanos, event_id) order got this right only
  * when the touch's id happened to sort first; ranking touches before
  * purchases at equal (ts, nanos) makes the parity hold by
  * construction (the shipped corpus never exercises the tie, so the
  * corpus parity spec passed either way — AttributionStreamSpec now
  * pins the tie case synthetically). Emitted attributions therefore
  * equal the batch rows bit for bit on a sealed stream
  * (AttributionStreamSpec asserts it on the real corpus).
  *
  * STATE BOUND (what matters at 100 TB/day): per user, ONE latest-touch
  * summary (constant size — the semantic memory attribution requires,
  * like SCD2's open segment) plus the in-horizon arrival buffer the
  * watermark drains every batch: O(events-per-user-per-horizon), never
  * O(stream length). Round-9 tightening: once a user's buffer is
  * drained AND their last touch has aged past the attribution window
  * behind the watermark (it can never be credited again), the state
  * entry is REMOVED — total state is bounded by users active within
  * one attribution horizon, not lifetime-distinct users; a returning
  * user simply re-seeds state from their next touch. DIVERGENCE from batch, inherent to streaming: a
  * touch older than every pending arrival but inside the 7-day window
  * is still credited (it lives in the constant summary) — but if the
  * JOB starts mid-stream, touches before the start are unknown; batch
  * over the same total data would credit them. Same re-admission class
  * as the dedup twins.
  */
object AttributionStream {

  final case class EventIn(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String)
  /** The batch q129 output row shape. */
  final case class AttrOut(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, touch_type: Option[String],
      touch_id: Option[Long], gap_sec: Option[Long])

  final case class Touch(ts: java.sql.Timestamp, event_id: Long,
      eventType: String)
  final case class BufEvent(ts: java.sql.Timestamp, event_id: Long,
      eventType: String)
  final case class UserState(lastTouch: Option[Touch],
      buffer: Vector[BufEvent])

  /** Total fold order: (ms, nanos, touches-before-everything-else,
    * event_id). The type rank exists for same-timestamp touch/purchase
    * pairs — see the class doc; among same-type same-ts events the
    * ascending event_id visit keeps max-id touch dedup a simple
    * replacement. */
  private def orderKey(e: BufEvent): (Long, Int, Int, Long) =
    (e.ts.getTime, e.ts.getNanos,
      e.eventType match { case "click" | "view" => 0; case _ => 1 },
      e.event_id)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** Attribute a streaming (event_id, ts, user_id, event_type) frame.
    * `watermark` bounds lateness and the arrival buffer; `windowSec`
    * is the attribution window (batch q129's 7 days by default). */
  def attribute(events: DataFrame, watermark: String = "10 minutes",
      windowSec: Long = 604800L): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("event_id").cast("long").as("event_id"), col("ts"),
        col("user_id").cast("long").as("user_id"), col("event_type"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(foldGroup(windowSec))
  }

  private def foldGroup(windowSec: Long)(user: Long,
      rows: Iterator[EventIn],
      state: GroupState[UserState]): Iterator[AttrOut] = {
    val prior = state.getOption.getOrElse(UserState(None, Vector.empty))
    val buffered = prior.buffer ++ rows.map(e =>
      BufEvent(e.ts, e.event_id, e.event_type))
    val wm = state.getCurrentWatermarkMs()
    // Strict seal (the Scd2Stream rule): only ts < wm has final order.
    val (ready, pending) = buffered.partition(_.ts.getTime < wm)
    var last = prior.lastTouch
    val out = Vector.newBuilder[AttrOut]
    ready.sortBy(orderKey).foreach { e =>
      e.eventType match {
        case "click" | "view" =>
          // batch parity: at the same (ts), the max event_id touch wins —
          // the sorted fold visits ids ascending, so replacement suffices
          last = Some(Touch(e.ts, e.event_id, e.eventType))
        case "purchase" =>
          val credited = last.filter(t =>
            micros(e.ts) - micros(t.ts) <= windowSec * 1000000L)
          out += AttrOut(e.event_id, user, e.ts,
            credited.map(_.eventType), credited.map(_.event_id),
            credited.map(t => (micros(e.ts) - micros(t.ts)) / 1000000L))
        case _ => () // signup/error: neither touch nor conversion
      }
    }
    // State TTL (round-9, advisor ask): a touch whose window is entirely
    // behind the watermark can never be credited again — any purchase
    // still admissible has ts >= wm > touch + window — so retaining it
    // makes state grow with LIFETIME-distinct users. Evict instead:
    // state is then bounded by users ACTIVE within one attribution
    // horizon, the honest 100 TB/day bound. The +1 ms guard keeps the
    // eviction conservative across the ms-watermark/micros-credit
    // domains (an extra millisecond of retention, never an early evict).
    val touchDead = last.forall(t =>
      t.ts.getTime + windowSec * 1000L + 1 < wm)
    if (pending.isEmpty && touchDead) {
      state.remove()
    } else {
      state.update(UserState(last, pending))
      val wake =
        if (pending.nonEmpty) pending.map(_.ts.getTime).min
        else last.map(_.ts.getTime + windowSec * 1000L + 1).getOrElse(wm + 1)
      state.setTimeoutTimestamp(math.max(wake, wm + 1))
    }
    out.result().iterator
  }
}
