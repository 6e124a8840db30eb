package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the co-occurrence / edge-support projection (batch
  * q102's `proj` stage, reused by q107/q122) — the ingest-time form of
  * "which item pairs have now co-occurred in enough baskets to count as
  * an edge". Composition mirrors the batch operator stage for stage:
  *
  *   batch q102 proj                    this stream
  *   -------------------------------    ---------------------------------
  *   DISTINCT (basket, item)            keyed state per basket dedups items
  *   within-basket pairs (u < v)        each NEW item pairs with the
  *                                      basket's previously-sighted items,
  *                                      in its arrival micro-batch
  *   groupBy (u,v) count baskets        keyed state per (u,v) accumulates
  *   HAVING count >= minShared          support; ONE row emitted at the
  *                                      threshold crossing
  *
  * STATE BOUND (the part that matters at 100 TB/day): stage 1 keeps one
  * entry per basket sighted within the watermark horizon — the item ids
  * and each item's max event time (16 bytes/item, bounded by basket
  * size); stage 2 keeps 24 bytes per DISTINCT in-horizon pair — i.e.
  * O(in-horizon co-occurrence graph), never O(stream length). Both
  * stages evict by event-time timeout at (last sighting + horizon) with
  * the late-copy clamp (a late in-watermark sighting never moves expiry
  * backward — the [[FuzzyDedupStream]] rule). No seal-order subtlety
  * applies: support counting is fold-order-insensitive, so arrivals
  * process in their arrival batch (unlike [[Scd2Stream]]'s strict
  * ts < wm sealing, which exists only because ITS fold is
  * order-sensitive).
  *
  * DOCUMENTED DIVERGENCES from batch q102 (inherent to bounded
  * single-pass state, not implementation shortcuts):
  *
  *   - HORIZON-LIMITED SUPPORT: only baskets/pairs sighted within one
  *     watermark horizon accumulate; a co-occurrence split across
  *     horizons re-counts from zero, where the batch projection over the
  *     same total data would sum it. Identical in kind to the dedup
  *     twins' re-admission semantic.
  *   - CROSSING, NOT FINAL, COUNTS: the batch edge row carries the final
  *     support; the stream emits the EDGE EXISTENCE EVENT (support ==
  *     minShared, with the crossing hit's event time) and stays silent
  *     after — the consumer that needs live totals keeps its own count
  *     downstream. A single-batch replay therefore yields exactly the
  *     batch edge SET (same (u,v) keys) with support pinned at
  *     minShared.
  *   - PAIR EVENT TIME: a pair's ts is max(item event times) — the
  *     co-occurrence "happens" when its later item arrives, which also
  *     keeps emitted rows at-or-above the input watermark by
  *     construction.
  */
object EdgeSupportStream {

  final case class MemberIn(o: Long, p: Long, ts: java.sql.Timestamp)
  /** One per NEW (basket, unordered item pair): u < v always. */
  final case class PairHit(u: Long, v: Long, ts: java.sql.Timestamp)
  /** Emitted once per (u,v), at the support's minShared crossing. */
  final case class EdgeOut(u: Long, v: Long, support: Long,
      ts: java.sql.Timestamp)
  /** Basket contents in-horizon: item -> max event time sighted. */
  final case class BasketState(items: Map[Long, Long], lastSeenMs: Long)
  final case class EdgeState(support: Long, emitted: Boolean,
      lastSeenMs: Long)

  /** Stage 1: streaming within-basket pair generation over a
    * (o, p, ts) membership stream. Duplicate (basket, item) sightings
    * are absorbed by the basket state — the streaming form of the batch
    * projection's DISTINCT — so each unordered pair is emitted at most
    * once per basket per horizon. */
  def pairs(members: DataFrame, watermark: String = "1 hour"): Dataset[PairHit] = {
    import members.sparkSession.implicits._
    members
      .withWatermark("ts", watermark)
      .select(col("o").cast("long").as("o"), col("p").cast("long").as("p"),
        col("ts"))
      .as[MemberIn]
      .groupByKey(_.o)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(pairGroup(watermark))
  }

  /** Stage 1 + stage 2: threshold-crossing edge events, one row per
    * (u,v) whose in-horizon support reaches `minShared`.
    *
    * Chains a second stateful operator after flatMapGroupsWithState, so
    * it needs `spark.sql.streaming.statefulOperator.checkCorrectness
    * .enabled=false` — safe for the same reason [[FuzzyDedupStream.assign]]
    * documents: stage 1 emits every pair within its arrival micro-batch
    * carrying an event time >= the arriving row's own, so a pair can be
    * late downstream only if its input already was. */
  def edges(members: DataFrame, minShared: Long,
      watermark: String = "1 hour"): Dataset[EdgeOut] = {
    import members.sparkSession.implicits._
    pairs(members, watermark).toDF()
      .withWatermark("ts", watermark) // re-designate after the stateful map
      .as[PairHit]
      .groupByKey(h => (h.u, h.v))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(edgeGroup(minShared, watermark))
  }

  private def pairGroup(horizon: String)(
      o: Long, rows: Iterator[MemberIn],
      state: GroupState[BasketState]): Iterator[PairHit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      // deterministic within-batch order so replay emits identical rows
      val batch = rows.toArray.sortBy(r => (r.ts.getTime, r.p))
      var items = state.getOption.map(_.items).getOrElse(Map.empty[Long, Long])
      val out = Vector.newBuilder[PairHit]
      batch.foreach { r =>
        val tMs = r.ts.getTime
        items.get(r.p) match {
          case Some(seen) =>
            // duplicate membership: refresh the item's time, no new pairs
            if (tMs > seen) items = items.updated(r.p, tMs)
          case None =>
            items.foreach { case (q, qMs) =>
              val ts = new java.sql.Timestamp(math.max(tMs, qMs))
              out += PairHit(math.min(r.p, q), math.max(r.p, q), ts)
            }
            items = items.updated(r.p, tMs)
        }
      }
      val lastSeen = math.max(batch.map(_.ts.getTime).max,
        state.getOption.map(_.lastSeenMs).getOrElse(Long.MinValue))
      state.update(BasketState(items, lastSeen))
      state.setTimeoutTimestamp(lastSeen, horizon)
      out.result().iterator
    }
  }

  private def edgeGroup(minShared: Long, horizon: String)(
      key: (Long, Long), rows: Iterator[PairHit],
      state: GroupState[EdgeState]): Iterator[EdgeOut] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.toArray.sortBy(_.ts.getTime)
      val prior = state.getOption.getOrElse(
        EdgeState(0L, emitted = false, Long.MinValue))
      var support = prior.support
      var emitted = prior.emitted
      val out = Vector.newBuilder[EdgeOut]
      batch.foreach { h =>
        support += 1
        if (!emitted && support >= minShared) {
          emitted = true
          out += EdgeOut(key._1, key._2, support, h.ts)
        }
      }
      val lastSeen = math.max(batch.map(_.ts.getTime).max, prior.lastSeenMs)
      state.update(EdgeState(support, emitted, lastSeen))
      state.setTimeoutTimestamp(lastSeen, horizon)
      out.result().iterator
    }
  }
}
