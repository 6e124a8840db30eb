package graft.streaming

import graft.operators.ExtendedQueries
import org.apache.spark.sql.DataFrame

/** Streaming twin of q247's DP-SHAPED deterministic count release
  * (distributionally discrete-Laplace; not a privacy guarantee — the
  * salts are repo-committed, see the q247 catalog doc): the
  * per-source count grid maintained ONLINE as documents stream in,
  * with the exact discrete-Laplace decoration (the double-hashed
  * leading-zero geometric noise) applied at READ time over the stored
  * cells — the live private dashboard pattern: state holds TRUE
  * counts, every read releases a noisy view through the same
  * deterministic mechanism, so releases are reproducible across reads
  * (one noise draw per partition, the standard "noise fixed per
  * release key" discipline).
  *
  * Parity class: source counts commute, so the streamed grid equals
  * the batch rollup regardless of arrival order or micro-batch split,
  * and the read-back is pure per-row algebra over the grid — batch
  * and stream share both code paths (dpGrid / dpReadBack).
  * StreamCheck re-asserts full-row equality with batch q247 per round.
  *
  * STATE BOUND (the 100 TB/day contract): |sources| cells — the
  * partition domain, independent of the stream length.
  */
object DpCountStream {

  /** The q247 count grid — shared rollup, batch and streaming. */
  def grid(docs: DataFrame): DataFrame = ExtendedQueries.dpGrid(docs)

  /** q247's discrete-Laplace decoration over stored (source, n_docs). */
  def readBack(cells: DataFrame): DataFrame =
    ExtendedQueries.dpReadBack(cells)
}
