package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of batch q210 point-in-time feature materialization —
  * the ONLINE FEATURE STORE: per user, a constant-size running feature
  * summary (event count, exact-cents spend, type bitmask, latest type)
  * maintained as keyed state, and every purchase label emits the
  * feature row AS OF its own timestamp, leakage-safe. Composition
  * mirrors the batch operator stage for stage:
  *
  *   batch q210                          this stream
  *   --------------------------------    -------------------------------
  *   running windows over non-label      keyed state: the user's running
  *   events ordered (ts, event_id)       (n, cents, mask, last_type)
  *   same-(user, ts) state dedup by      ascending-id fold visits peers
  *   max event_id                        in order; replacement suffices
  *   as-of union + (ts, tag) order       features rank before labels at
  *   (features first at equal ts)        equal (ts, nanos) in the fold
  *   cold-start labels emit NULLs        state None -> None fields
  *
  * Out-of-order handling is the [[Scd2Stream]]/[[AttributionStream]]
  * discipline verbatim: arrivals buffer in keyed state until the
  * STRICT watermark prefix (ts < wm) has final relative order, then
  * fold in (ts, nanos, features-first, event_id) total order — the
  * type rank at equal timestamps is q210's `ORDER BY ts, tag` carried
  * into the fold, so a same-timestamp non-label event is absorbed into
  * the summary BEFORE any same-timestamp label reads it, exactly like
  * the batch carry. Emitted snapshots therefore equal the batch rows
  * bit for bit on a sealed stream (FeatureSnapshotStreamSpec asserts
  * it on the real corpus; StreamCheck re-asserts it per round).
  *
  * STATE BOUND (the 100 TB/day contract): per user, ONE constant-size
  * summary — 3 longs + a short string — plus the in-horizon arrival
  * buffer the watermark drains every batch. The summary is the online
  * feature table itself (what a feature store persists), so unlike the
  * attribution twin it is NOT evicted on inactivity: running lifetime
  * features are the declared semantics, and state is O(distinct
  * users), the same as the store's serving table. DIVERGENCE from
  * batch, inherent to streaming: a job started mid-stream has no
  * pre-start feature history — batch over the same total data would
  * count it. Same re-admission class as the dedup twins.
  */
object FeatureSnapshotStream {

  final case class EventIn(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  /** The batch q210 output row shape. */
  final case class SnapOut(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, purchase_cents: Long,
      n_events_asof: Option[Long], cents_asof: Option[Long],
      n_types_asof: Option[Long], last_type_asof: Option[String])

  final case class BufEvent(ts: java.sql.Timestamp, event_id: Long,
      eventType: String, cents: Long)
  final case class Features(nEvents: Long, cents: Long, mask: Long,
      lastType: String)
  final case class UserState(features: Option[Features],
      buffer: Vector[BufEvent])

  /** q210's type bitmask — the same CASE mapping as the batch window. */
  private def bit(eventType: String): Long = eventType match {
    case "click" => 1L
    case "view" => 2L
    case "signup" => 4L
    case "error" => 8L
    case _ => 16L
  }

  /** Total fold order: (ms, nanos, features-before-labels, event_id) —
    * the batch `ORDER BY ts, tag` plus the ascending-id visit that
    * makes max-id state dedup a plain replacement. */
  private def orderKey(e: BufEvent): (Long, Int, Int, Long) =
    (e.ts.getTime, e.ts.getNanos,
      if (e.eventType == "purchase") 1 else 0, e.event_id)

  /** Materialize streaming feature snapshots from an (event_id, ts,
    * user_id, event_type, value) frame. `watermark` bounds lateness
    * and the arrival buffer. */
  def snapshots(events: DataFrame, watermark: String = "10 minutes")
      : Dataset[SnapOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("event_id").cast("long").as("event_id"), col("ts"),
        col("user_id").cast("long").as("user_id"), col("event_type"),
        col("value").cast("double").as("value"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(foldGroup)
  }

  private def foldGroup(user: Long, rows: Iterator[EventIn],
      state: GroupState[UserState]): Iterator[SnapOut] = {
    val prior = state.getOption.getOrElse(UserState(None, Vector.empty))
    val buffered = prior.buffer ++ rows.map(e =>
      BufEvent(e.ts, e.event_id, e.event_type,
        math.round(e.value * 100)))
    val wm = state.getCurrentWatermarkMs()
    // Strict seal (the Scd2Stream rule): only ts < wm has final order.
    val (ready, pending) = buffered.partition(_.ts.getTime < wm)
    var feats = prior.features
    val out = Vector.newBuilder[SnapOut]
    ready.sortBy(orderKey).foreach { e =>
      if (e.eventType == "purchase") {
        out += SnapOut(user, e.ts, e.event_id, e.cents,
          feats.map(_.nEvents), feats.map(_.cents),
          feats.map(f => java.lang.Long.bitCount(f.mask).toLong),
          feats.map(_.lastType))
      } else {
        val f = feats.getOrElse(Features(0L, 0L, 0L, e.eventType))
        feats = Some(Features(f.nEvents + 1L, f.cents + e.cents,
          f.mask | bit(e.eventType), e.eventType))
      }
    }
    // The summary is the online feature table — it persists for the
    // user's lifetime (never evicted; see the state-bound doc above).
    // A timeout is registered only while arrivals wait on the seal, so
    // the key re-folds as soon as the watermark passes its oldest
    // pending event — without it, a user whose last batch carried only
    // unsealed rows would hold them forever.
    state.update(UserState(feats, pending))
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(
        math.max(pending.map(_.ts.getTime).min, wm + 1))
    out.result().iterator
  }
}
