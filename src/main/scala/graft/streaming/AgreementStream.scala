package graft.streaming

import graft.operators.AgreementQueries
import org.apache.spark.sql.DataFrame

/** Streaming twin of q235's inter-annotator agreement: the 3x3
  * contingency grid maintained ONLINE as labeled documents stream in —
  * the live agreement dashboard an annotation pipeline watches while
  * raters work. The annotator labels are pure per-row expressions, so
  * the twin is one built-in streaming aggregation in Complete mode
  * (the ShardStream/CalibrationStream grid class), with q235's
  * marginals/kappa decoration applied at READ time over the stored
  * cells.
  *
  * Parity class: cell counts commute, so the streamed grid equals the
  * batch rollup regardless of arrival order or micro-batch split, and
  * the read-back (marginals, exact integer kappa_num/kappa_den, po,
  * kappa) is pure algebra over the grid — batch and stream share both
  * code paths (annotatorLabels + agreementGrid / agreementReadBack).
  * StreamCheck re-asserts full-row equality with batch q235 per round.
  *
  * STATE BOUND (the 100 TB/day contract): <= 9 cells (3x3 label grid)
  * — constant, independent of the stream.
  */
object AgreementStream {

  /** The q235 contingency grid — shared election, batch and streaming.
    * Input: raw document rows carrying n_chars + text. */
  def grid(docs: DataFrame): DataFrame =
    AgreementQueries.agreementGrid(AgreementQueries.annotatorLabels(docs))

  /** q235's marginals/kappa decoration over stored (a, b, n_cell). */
  def readBack(cells: DataFrame): DataFrame =
    AgreementQueries.agreementReadBack(cells)
}
