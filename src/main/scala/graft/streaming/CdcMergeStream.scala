package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch q90 CDC compaction — the keyed-state
  * mirror of `TemporalQueries.cdcMerge`'s aggregate side: per key,
  * maintain the LAST change (max by the (ts, event_id) total order)
  * and the change count, and emit the refreshed snapshot row for every
  * key touched in a micro-batch (Update mode — the row IS the upsert
  * notification a downstream MERGE consumes).
  *
  * Unlike Scd2Stream this twin needs NO watermark arrival buffer:
  * max-by-total-order and counting are COMMUTATIVE, so out-of-order
  * arrivals fold into state in any order and the snapshot after any
  * prefix of batches equals the batch compaction of the same rows —
  * a stale arrival simply loses the max. (SCD2 must wait for the
  * watermark because segment boundaries depend on the relative order
  * of neighbors; a last-write-wins register does not.)
  *
  * STATE BOUND at 100 TB/day: exactly ONE constant-size register per
  * live key — the same cardinality as the compacted table itself.
  * Delete tombstones stay in state deliberately: a 'D' register is the
  * knowledge that the key was dropped (and suppresses stale
  * resurrections by older U rows), while a genuinely newer U re-inserts
  * the key, the standard CDC resurrection semantics.
  */
object CdcMergeStream {

  final case class ChangeIn(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, op: String, value: Double)
  /** Refreshed snapshot row; `deleted` marks a tombstone emission. */
  final case class SnapRow(user_id: Long, last_op: String,
      last_ts: java.sql.Timestamp, last_value: Double, n_changes: Long,
      deleted: Boolean)

  final case class Register(ts: java.sql.Timestamp, eventId: Long,
      op: String, value: Double, nChanges: Long)

  /** Micro-precision total order, identical to the batch struct-max:
    * (ts, event_id), with nanos so same-millisecond changes order. */
  private def orderKey(ts: java.sql.Timestamp, id: Long): (Long, Int, Long) =
    (ts.getTime, ts.getNanos, id)

  /** Compact a streaming changelog (user_id, ts, event_id, op I/U/D,
    * value) into per-key snapshot refresh emissions. */
  def snapshots(changes: DataFrame): Dataset[SnapRow] = {
    import changes.sparkSession.implicits._
    changes.as[ChangeIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        foldGroup)
  }

  private def foldGroup(key: Long, rows: Iterator[ChangeIn],
      state: GroupState[Register]): Iterator[SnapRow] = {
    val arrivals = rows.toVector
    if (arrivals.isEmpty) return Iterator.empty
    val newest = arrivals.maxBy(c => orderKey(c.ts, c.event_id))
    val merged = state.getOption match {
      case Some(r) =>
        val keep = orderKey(r.ts, r.eventId)
        val cand = orderKey(newest.ts, newest.event_id)
        val (ts, id, op, v) =
          if (Ordering[(Long, Int, Long)].gt(cand, keep))
            (newest.ts, newest.event_id, newest.op, newest.value)
          else (r.ts, r.eventId, r.op, r.value)
        Register(ts, id, op, v, r.nChanges + arrivals.size)
      case None =>
        Register(newest.ts, newest.event_id, newest.op, newest.value,
          arrivals.size.toLong)
    }
    state.update(merged)
    Iterator.single(SnapRow(key, merged.op, merged.ts, merged.value,
      merged.nChanges, merged.op == "D"))
  }
}
