package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch q174 CUSUM change-point monitor — the
  * ingestion drift alarm run ONLINE: per event type, daily arrival
  * counts fold through Page's one-sided CUSUM recursion against a
  * CONFIGURED target rate (`kMicroByType`, micro-events/day), and each
  * day's drift statistics emit the moment the watermark seals the day.
  *
  * The batch operator derives k from the observed global mean (it sees
  * the whole history); the deployed monitor can't — its k is the
  * provisioned/contracted rate, supplied here per type. Parity with
  * batch (StreamCheck + DriftStreamSpec) therefore feeds the stream
  * the batch-computed k values, after which sealed daily (cnt, up,
  * down) rows must equal the batch recursion exactly: both sides are
  * pure integer arithmetic in the same day order.
  *
  * Day sealing mirrors Scd2Stream's prefix rule, lifted from events to
  * days: a day d is final only when the watermark passes its END
  * (wm >= d + 86400000 — any later arrival has ts >= wm, hence a later
  * day), so each sealed day's count is complete and the running
  * (cs, min, max) fold is deterministic. Types absent from
  * `kMicroByType` are not monitored and emit nothing (the marker-row
  * escape hatch the parity harnesses use).
  *
  * STATE BOUND (the 100 TB/day contract): per type, THREE longs of
  * CUSUM state plus a dayMs->count map for unsealed days — bounded by
  * the watermark horizon in DAYS, not by stream length or event
  * volume: a billion in-horizon events for one type still cost one
  * map entry per open day.
  */
object DriftStream {

  final case class EventIn(event_id: Long, ts: java.sql.Timestamp,
      event_type: String)
  /** One sealed day of the monitor: its count and the post-update
    * one-sided drift statistics (micro-units, exact integers). */
  final case class DriftOut(event_type: String, day: java.sql.Timestamp,
      cnt: Long, up_micro: Long, down_micro: Long)

  final case class TypeState(cs: Long, minCs: Long, maxCs: Long,
      pending: Map[Long, Long])

  private val DayMs = 86400000L

  /** Fold a streaming (event_id, ts, event_type) frame into sealed
    * daily CUSUM rows against the configured per-type target rates. */
  def monitor(events: DataFrame, kMicroByType: Map[String, Long],
      watermark: String = "10 minutes"): Dataset[DriftOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("event_id").cast("long").as("event_id"), col("ts"),
        col("event_type"))
      .as[EventIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(foldGroup(kMicroByType))
  }

  private def foldGroup(kMicroByType: Map[String, Long])(
      eventType: String, rows: Iterator[EventIn],
      state: GroupState[TypeState]): Iterator[DriftOut] =
    kMicroByType.get(eventType) match {
      case None =>
        rows.foreach(_ => ()) // drain: unmonitored type, keep no state
        Iterator.empty
      case Some(k) =>
        val prior = state.getOption
          .getOrElse(TypeState(0L, 0L, 0L, Map.empty))
        var pending = prior.pending
        rows.foreach { e =>
          val day = Math.floorDiv(e.ts.getTime, DayMs) * DayMs
          pending = pending.updated(day, pending.getOrElse(day, 0L) + 1L)
        }
        val wm = state.getCurrentWatermarkMs()
        // a day is final once the watermark passes its END: any future
        // arrival has ts >= wm >= day + DayMs, i.e. a later day
        val (finalDays, open) = pending.partition(_._1 + DayMs <= wm)
        var (cs, minCs, maxCs) = (prior.cs, prior.minCs, prior.maxCs)
        val out = Vector.newBuilder[DriftOut]
        finalDays.toVector.sortBy(_._1).foreach { case (day, cnt) =>
          cs += 1000000L * cnt - k
          minCs = math.min(minCs, cs); maxCs = math.max(maxCs, cs)
          out += DriftOut(eventType, new java.sql.Timestamp(day), cnt,
            cs - math.min(0L, minCs), math.max(0L, maxCs) - cs)
        }
        state.update(TypeState(cs, minCs, maxCs, open))
        if (open.nonEmpty) {
          // wake when the earliest open day can seal
          state.setTimeoutTimestamp(
            math.max(open.keys.min + DayMs, wm + 1))
        }
        out.result().iterator
    }
}
