package graft.streaming

import graft.operators.CurationQueries
import org.apache.spark.sql.DataFrame

/** Streaming twin of q253's leave-one-source-out ablation: the
  * per-source (doc count, token sum) ledger maintained ONLINE as
  * documents stream in, with the rest-of-corpus deltas derived at
  * READ time via rest = total - self — the live data-valuation
  * dashboard: every read prices each source's marginal contribution
  * against the corpus AS OF NOW, with no second scan (the
  * leave-one-out algebra needs only the ledger and its own total).
  *
  * Parity class: doc and token counts commute, so the streamed
  * ledger equals the batch rollup under any arrival order or
  * micro-batch split, and the read-back is pure per-row algebra over
  * the ledger plus its broadcast total — batch q253 and the stream
  * share BOTH code paths (looGrid / looRead). StreamCheck re-asserts
  * full-row equality with batch q253 per round.
  *
  * STATE BOUND (the 100 TB/day contract): |sources| cells of two
  * longs — the source domain, independent of the stream length.
  */
object LooAblationStream {

  /** The q253 ledger over a (source, n_tok) stream. */
  def grid(rows: DataFrame): DataFrame = CurationQueries.looGrid(rows)

  /** q253's ablation read over stored ledger cells. */
  def readBack(cells: DataFrame): DataFrame =
    CurationQueries.looRead(cells)
}
