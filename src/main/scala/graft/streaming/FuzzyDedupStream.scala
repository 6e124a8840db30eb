package graft.streaming

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of FUZZY dedup clustering (batch q66) — the ingest-time
  * form of "find the near-duplicates of what we already saw and assign
  * them to the earlier copy's cluster". Composition mirrors the batch
  * operator stage for stage:
  *
  *   batch q66                         this stream
  *   ------------------------------    -----------------------------------
  *   3-gram shingles -> MinHash(16)    same expressions, per micro-batch
  *   LSH 8x2 band-bucket equi-join     keyed state per (band, bucket)
  *   exact-Jaccard confirm (j>=0.5)    sketch confirm: fraction of matching
  *                                     minhash components vs the bucket's
  *                                     canonical (the signature IS in hand;
  *                                     the text no longer is)
  *   connected components + min-id     per-doc min over its 8 bucket
  *   canonical election                candidates (downstream streaming agg)
  *
  * STATE BOUND (the part that matters at 100 TB/day): one entry per
  * DISTINCT (band, bucket) sighted within the watermark horizon — the
  * 12-byte key, the canonical's 8-byte doc id, its 16-long minhash
  * signature (128 bytes) and a timeout timestamp, ~160 bytes, i.e.
  * O(distinct-buckets-per-horizon) regardless of stream length. Each
  * bucket's event-time timeout is (last sighting + horizon), exactly the
  * exact-twin's ([[DedupClusterStream]]) retention rule, including the
  * late-copy clamp (a late in-watermark sighting never moves expiry
  * backward).
  *
  * DOCUMENTED DIVERGENCES from batch q66 (all inherent to bounded
  * single-pass state, not implementation shortcuts):
  *
  *   - HORIZON-LIMITED RECALL: a near-dup arriving after the watermark
  *     horizon founds a fresh cluster — q66 over the same corpus would
  *     merge them. Identical to the exact twin's re-admission semantic.
  *   - NO TRANSITIVE CLOSURE: q66 runs label propagation, so a chain
  *     A~B~C lands in one cluster even when A!~C. Here a doc joins a
  *     cluster only via a bucket its own signature hits, so chain links
  *     that share no band stay separate. At the j>=0.8 similarity this
  *     corpus exhibits, chains share nearly all bands and the difference
  *     is empty; it is real for adversarial chains.
  *   - FIRST-ARRIVAL CANONICAL: the founder is the earliest sighting
  *     (ties broken by min doc_id within a micro-batch), not the global
  *     min doc_id — ingest order is the only order a stream has. A
  *     single-batch corpus with equal timestamps elects min doc_id per
  *     bucket, matching q66's election.
  *   - ONE FOUNDER PER BUCKET: a hash-collision doc DISSIMILAR to the
  *     bucket's canonical does not found a second lineage in that bucket
  *     (that would make state per-bucket unbounded); it simply takes no
  *     candidate from it. With 8 independent bands a real near-dup pair
  *     still meets in its other buckets.
  *
  * Shingle-less docs (< 3 tokens) cannot be near-dups by shingle Jaccard;
  * they surface as singletons through a stateless sentinel band (-1) so
  * every input doc appears in the output exactly once, like q66.
  */
object FuzzyDedupStream {

  private val NumHashes = 16
  private val NumBands = 8
  private val RowsPerBand = 2
  /** Minimum fraction of matching minhash components for a doc to join a
    * bucket's canonical — E[fraction] = true Jaccard, so this mirrors
    * q66's j >= 0.5 confirm at sketch resolution (1/16). */
  private val SimThreshold = 0.5

  final case class BandIn(doc_id: Long, ts: java.sql.Timestamp,
      band: Int, bucket: Long, sig: Array[Long])
  /** One per (doc, band): the cluster id this bucket proposes. */
  final case class Candidate(doc_id: Long, ts: java.sql.Timestamp, candidate: Long)
  /** Bucket founder + its signature (for the sketch confirm) + the max
    * event time ever sighted (late-copy clamp), kept until timeout. */
  final case class BucketState(canonicalId: Long, canonicalSig: Array[Long],
      lastSeenMs: Long)

  /** Per-(doc, band) cluster proposals over a streaming (doc_id, ts,
    * text) frame — the single-stateful-operator core. Each doc emits one
    * row per band (all within its arrival micro-batch); its cluster id is
    * the MIN of its proposals, a batch-local election any consumer can
    * run (e.g. inside foreachBatch, with zero added latency). `watermark`
    * is both the late-data bound and the bucket-state retention horizon. */
  def candidates(docs: DataFrame, watermark: String = "1 hour"): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    val sh = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"),
        TextFunctions.shinglesOfText(col("text"), 3).as("sh"))
    // sentinel band -1 for shingle-less docs: stateless self-assignment
    // (the group body never creates state for it), one row per doc
    val bands = sh
      .select(col("doc_id"), col("ts"),
        when(size(col("sh")) > 0,
          HashFunctions.minhashSignature(col("sh"), NumHashes)).as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(when(col("sig").isNotNull,
            HashFunctions.bandHashes(col("sig"), NumBands, RowsPerBand))
          .otherwise(array(struct(lit(-1).as("band"), col("doc_id").as("bucket")))))
          .as("bh"))
      .select(col("doc_id"), col("ts"),
        col("bh.band").as("band"), col("bh.bucket").as("bucket"), col("sig"))
      .as[BandIn]
    bands
      .groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        assignGroup(watermark))
  }

  /** [[candidates]] + in-stream canonical election: min over the up-to-8
    * bucket proposals — the streaming analog of q66's min-id labeling,
    * one (doc_id, ts, cluster_id, is_canonical) row per doc, emitted once
    * the watermark passes the doc's event time (append mode).
    *
    * This chains a streaming aggregation after flatMapGroupsWithState, so
    * it needs `spark.sql.streaming.statefulOperator.checkCorrectness
    * .enabled=false` (Spark's documented escape hatch for the global-
    * watermark heuristic). The composition is SAFE here, not just
    * permitted: the stateful map emits every row within its arrival
    * micro-batch carrying that row's own event time, so a row can only be
    * "late" for the downstream aggregation if it was already past the
    * watermark on INPUT — and dropping those is exactly the late-data
    * contract the watermark declares. No in-horizon row can be lost (the
    * batch-start watermark is <= every non-late event time in the batch).
    * Consumers that cannot accept the flag (or the horizon-length output
    * latency append mode implies) should run [[candidates]] and elect in
    * foreachBatch instead. */
  def assign(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    // event time must be re-designated after a stateful map
    candidates(docs, watermark).toDF()
      .withWatermark("ts", watermark)
      .groupBy(col("doc_id"), col("ts"))
      .agg(min(col("candidate")).as("cluster_id"))
      .select(col("doc_id"), col("ts"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }

  /** Fraction of equal components between two equal-length signatures —
    * an unbiased estimator of shingle Jaccard. */
  private def sketchSim(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  private def assignGroup(horizon: String)(
      key: (Int, Long), rows: Iterator[BandIn],
      state: GroupState[BucketState]): Iterator[Candidate] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else if (key._1 == -1) {
      // sentinel band: shingle-less singletons, stateless by design
      rows.map(b => Candidate(b.doc_id, b.ts, b.doc_id))
    } else {
      // deterministic within-batch order: earliest (ts, doc_id) founds
      val batch = rows.toArray.sortBy(b => (b.ts.getTime, b.doc_id))
      var founder = state.getOption
      val out = batch.map { b =>
        founder match {
          case Some(st) if sketchSim(b.sig, st.canonicalSig) >= SimThreshold =>
            Candidate(b.doc_id, b.ts, st.canonicalId)
          case Some(_) =>
            // collision with a dissimilar founder: no proposal from this
            // bucket (see "one founder per bucket" in the scaladoc)
            Candidate(b.doc_id, b.ts, b.doc_id)
          case None =>
            founder = Some(BucketState(b.doc_id, b.sig, Long.MinValue))
            Candidate(b.doc_id, b.ts, b.doc_id)
        }
      }
      val st = founder.get
      // max over state AND batch: a late-but-in-watermark sighting must
      // not move the expiry backward (the exact twin's clamp rule)
      val lastSeen = math.max(batch.map(_.ts.getTime).max, st.lastSeenMs)
      state.update(BucketState(st.canonicalId, st.canonicalSig, lastSeen))
      state.setTimeoutTimestamp(lastSeen, horizon)
      out.iterator
    }
  }
}
