package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q161's incremental materialized-view refresh — the
  * production shape of IVM: the change-data feed (q160's typed rows)
  * arrives as a stream, and the MV delta is maintained by Spark's
  * BUILT-IN streaming aggregation (no custom state needed: the delta
  * fold is a pair of sums, and sums are what the streaming agg state
  * store already does exactly-once per micro-batch). Each micro-batch
  * emits the refreshed per-group cumulative delta (Update mode — the
  * row IS the upsert a downstream MV table consumes), so
  * mv_v_next(g) = mv_v1(g) + (d_n, d_sum) holds after ANY prefix of
  * batches for the rows folded so far.
  *
  * No watermark: the per-row delta contribution is COMMUTATIVE
  * (insert +1/+cents, delete -1/-cents, update pre/post a cancelling
  * pair), so arrival order across micro-batches cannot change the
  * cumulative state — the same argument as CdcMergeStream's
  * last-write-wins register, here for an abelian-group fold. An update
  * whose pre/post rows land in DIFFERENT batches passes through a
  * transiently unbalanced state that the later batch corrects — exact
  * parity is guaranteed at feed-drained points, which is the IVM
  * refresh contract (a refresh transaction carries whole changes).
  *
  * STATE BOUND at 100 TB/day: one (sum, sum, count) register per MV
  * GROUP — state is the cardinality of the VIEW, not the feed; the
  * feed itself is never retained.
  */
object MvRefreshStream {

  /** Fold a streaming CDF (k, commit_ver, change_type, cents) into
    * per-group cumulative MV deltas (g, d_n, d_sum, n_folded). Run
    * with outputMode Update; n_folded is monotone per group, so the
    * latest emission per g is the row with max n_folded. */
  def deltas(cdf: DataFrame): DataFrame =
    cdf.select(expr("((k % 10) + 10) % 10").cast("long").as("g"),
      when(col("change_type") === "insert", 1L)
        .when(col("change_type") === "delete", -1L)
        .otherwise(0L).as("dn"),
      when(col("change_type") === "insert", col("cents"))
        .when(col("change_type") === "delete", -col("cents"))
        .when(col("change_type") === "update_preimage", -col("cents"))
        .otherwise(col("cents")).as("ds"))
      .groupBy("g")
      .agg(sum("dn").cast("long").as("d_n"),
        sum("ds").cast("long").as("d_sum"),
        count(lit(1)).as("n_folded"))
}
