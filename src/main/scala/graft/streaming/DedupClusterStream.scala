package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of exact dedup CLUSTERING (the batch q33/q65 pair):
  * every arriving document is assigned a cluster_id = the doc_id of the
  * first document seen with the same content hash, and flagged canonical
  * iff it IS that first document — the ingest-time form of "group the
  * copies, keep one, remember which" that a training-data pipeline runs
  * before storage. `dropDuplicatesWithinWatermark` alone yields only the
  * canonical stream; assigning LATER copies to their canonical requires
  * explicit keyed state, so this uses flatMapGroupsWithState.
  *
  * STATE BOUND (the part that matters at 100 TB/day): one entry per
  * DISTINCT content hash sighted within the watermark horizon — a
  * (16-byte hash key, 8-byte canonical id, timeout timestamp) triple,
  * O(distinct-hashes-per-horizon) regardless of stream length. Each
  * group's timeout is event-time at (last sighting + the watermark
  * horizon): exactly `dropDuplicatesWithinWatermark`'s retention, so
  * the two operators age state identically. After expiry a re-arriving
  * hash founds a NEW cluster (its own doc_id) — the documented,
  * watermark-bounded semantic, identical to what
  * dropDuplicatesWithinWatermark would re-admit.
  */
object DedupClusterStream {

  final case class DocIn(doc_id: Long, ts: java.sql.Timestamp, content_hash: String)
  final case class ClusterOut(doc_id: Long, content_hash: String,
      cluster_id: Long, is_canonical: Boolean)
  /** canonical doc id for the hash + the max event time ever sighted
    * (so a LATE in-watermark copy can never move the expiry backward);
    * kept until event-time timeout. */
  final case class HashState(canonicalId: Long, lastSeenMs: Long)

  /** Assign watermark-bounded exact-dedup cluster ids over a streaming
    * (doc_id, ts, text) frame. `watermark` is both the late-data bound
    * and the state-retention horizon. */
  def assign(docs: DataFrame, watermark: String = "1 hour"): Dataset[ClusterOut] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", watermark)
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"),
        md5(col("text").cast("binary")).as("content_hash"))
      .as[DocIn]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        assignGroup(watermark))
  }

  private def assignGroup(horizon: String)(
      hash: String, rows: Iterator[DocIn],
      state: GroupState[HashState]): Iterator[ClusterOut] = {
    if (state.hasTimedOut) {
      // watermark passed (last sighting + horizon): forget the cluster
      state.remove()
      Iterator.empty
    } else {
      // deterministic within-batch order: earliest (ts, doc_id) founds
      // the cluster when no state exists yet
      val batch = rows.toArray.sortBy(d => (d.ts.getTime, d.doc_id))
      val canonical = state.getOption.map(_.canonicalId)
        .getOrElse(batch.head.doc_id)
      // max over state AND batch: a late-but-in-watermark copy must not
      // move the expiry BACKWARD from an earlier batch's later sighting
      val lastSeen = math.max(batch.map(_.ts.getTime).max,
        state.getOption.map(_.lastSeenMs).getOrElse(Long.MinValue))
      state.update(HashState(canonical, lastSeen))
      // event-time timeout at last sighting + horizon — the same
      // retention dropDuplicatesWithinWatermark gives its hash state
      state.setTimeoutTimestamp(lastSeen, horizon)
      batch.iterator.map(d =>
        ClusterOut(d.doc_id, hash, canonical, d.doc_id == canonical))
    }
  }
}
