package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of batch q144's degree profile over the purchase
  * graph — the ingest-time form of "which nodes have become hubs",
  * round 9's answer to the one genuinely-new twin the round-8 review
  * suggested. Composition mirrors the batch operator stage for stage:
  *
  *   batch q144                          this stream
  *   --------------------------------    -------------------------------
  *   DISTINCT (customer, supplier)       keyed state per pair dedups
  *   purchase pairs                      sightings; FIRST sighting emits
  *                                       one hit per endpoint
  *   symmetric union -> per-node         keyed state per node counts
  *   degree (distinct partners)          distinct-partner hits
  *   floor(log2(degree)) histogram       ONE BucketCross row emitted
  *                                       each time a node's degree
  *                                       enters a new power-of-two
  *                                       bucket (degree hits 1, 2, 4,
  *                                       8, ...)
  *
  * The bucket rule is the batch one bit for bit: log2_bucket =
  * 63 - numberOfLeadingZeros(degree) == length(bin(degree)) - 1 —
  * integer arithmetic, never libm log2 (q144's parity note).
  *
  * STATE BOUND (what matters at 100 TB/day): stage 1 keeps one entry
  * per DISTINCT in-horizon pair — the edge set itself, the same
  * cardinality the batch shuffle carries; stage 2 keeps 16 bytes per
  * in-horizon node. Both evict by event-time timeout at
  * (last sighting + horizon) with the late-copy clamp (a late
  * in-watermark sighting never moves expiry backward); re-sighted
  * pairs forward KEEPALIVE hits (at most one per pair per
  * micro-batch, flagged isNew=false) so stage 2's clock follows node
  * activity and an active hub's degree state lives exactly as long
  * as its pair states do. No seal-order
  * subtlety: pair dedup and degree counting are fold-order-insensitive
  * (a set and a count), so arrivals process in their arrival batch —
  * the [[EdgeSupportStream]] discipline, not [[Scd2Stream]]'s strict
  * sealing.
  *
  * DOCUMENTED DIVERGENCES from batch q144 (inherent to bounded
  * single-pass state): horizon-limited degrees (a pair re-sighted
  * across horizons re-counts — the dedup twins' re-admission
  * semantic), and CROSSING, not final, rows: the stream emits bucket
  * ENTRY events; the consumer derives the live histogram by keeping
  * each node's latest crossing. A single-batch replay therefore
  * yields the batch profile exactly: max bucket per node equals
  * floor(log2(final degree)), and the count of nodes whose max
  * crossing is b equals q144's n_nodes for every bucket >= its
  * entry population (DegreeProfileStreamSpec asserts the exact
  * correspondence on the real corpus).
  *
  * Chains two stateful operators, so callers set
  * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=
  * false` — safe for the [[EdgeSupportStream]] reason: stage 1 emits
  * hits within the arrival micro-batch carrying the arriving row's
  * own event time, so a hit can be late downstream only if its input
  * already was.
  */
object DegreeProfileStream {

  final case class PairIn(c: Long, s: Long, ts: java.sql.Timestamp)
  /** One per endpoint of a sighted pair: node ids carry the batch's
    * c<id>/s<id> tags so the two id spaces never collide. `isNew` is
    * true only for a pair's FIRST sighting (the degree increment);
    * re-sightings forward as KEEPALIVES (at most one per pair per
    * micro-batch) so stage 2's eviction clock tracks node ACTIVITY,
    * not just new-partner arrivals — without them an active hub whose
    * partner set stopped growing would age out of stage 2 while all
    * its pair states stayed live, and its next crossing would restart
    * at degree 1. */
  final case class NodeHit(node: String, ts: java.sql.Timestamp,
      isNew: Boolean)
  /** Emitted when `node`'s in-horizon degree ENTERS bucket
    * floor(log2(degree)) — i.e. at degree exactly 1, 2, 4, 8, ... */
  final case class BucketCross(node: String, log2_bucket: Long,
      degree: Long, ts: java.sql.Timestamp)

  final case class PairState(lastSeenMs: Long)
  final case class NodeState(degree: Long, lastSeenMs: Long)

  /** Stage 1: first-sighting dedup of (c, s, ts) purchase-pair
    * sightings — the streaming form of the batch DISTINCT. Each new
    * pair emits one hit per endpoint at the sighting's event time. */
  def nodeHits(pairs: DataFrame, watermark: String = "1 hour")
      : Dataset[NodeHit] = {
    import pairs.sparkSession.implicits._
    pairs
      .withWatermark("ts", watermark)
      .select(col("c").cast("long").as("c"), col("s").cast("long").as("s"),
        col("ts"))
      .as[PairIn]
      .groupByKey(p => (p.c, p.s))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(pairGroup(watermark))
  }

  /** Stage 1 + stage 2: power-of-two bucket-entry events per node. */
  def degreeCrossings(pairs: DataFrame, watermark: String = "1 hour")
      : Dataset[BucketCross] = {
    import pairs.sparkSession.implicits._
    nodeHits(pairs, watermark).toDF()
      .withWatermark("ts", watermark) // re-designate after the stateful map
      .as[NodeHit]
      .groupByKey(_.node)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(nodeGroup(watermark))
  }

  private def pairGroup(horizon: String)(
      key: (Long, Long), rows: Iterator[PairIn],
      state: GroupState[PairState]): Iterator[NodeHit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.toArray.sortBy(_.ts.getTime)
      val out = Vector.newBuilder[NodeHit]
      if (state.getOption.isEmpty) {
        val first = batch.head
        out += NodeHit("c" + key._1, first.ts, isNew = true)
        out += NodeHit("s" + key._2, first.ts, isNew = true)
      } else {
        // keepalive: once per pair per batch, at the batch's latest ts
        val latest = batch.last
        out += NodeHit("c" + key._1, latest.ts, isNew = false)
        out += NodeHit("s" + key._2, latest.ts, isNew = false)
      }
      val lastSeen = math.max(batch.map(_.ts.getTime).max,
        state.getOption.map(_.lastSeenMs).getOrElse(Long.MinValue))
      state.update(PairState(lastSeen))
      state.setTimeoutTimestamp(lastSeen, horizon)
      out.result().iterator
    }
  }

  private def nodeGroup(horizon: String)(
      node: String, rows: Iterator[NodeHit],
      state: GroupState[NodeState]): Iterator[BucketCross] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.toArray.sortBy(_.ts.getTime)
      var deg = state.getOption.map(_.degree).getOrElse(0L)
      val out = Vector.newBuilder[BucketCross]
      batch.foreach { h =>
        if (h.isNew) {
          deg += 1
          // entered a new floor(log2) bucket iff degree is a power of two
          if ((deg & (deg - 1)) == 0) {
            out += BucketCross(node,
              (63 - java.lang.Long.numberOfLeadingZeros(deg)).toLong, deg, h.ts)
          }
        } // keepalives refresh lastSeen below, never the degree
      }
      val lastSeen = math.max(batch.map(_.ts.getTime).max,
        state.getOption.map(_.lastSeenMs).getOrElse(Long.MinValue))
      state.update(NodeState(deg, lastSeen))
      state.setTimeoutTimestamp(lastSeen, horizon)
      out.result().iterator
    }
  }
}
