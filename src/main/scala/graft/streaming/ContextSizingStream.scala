package graft.streaming

import graft.operators.CurationQueries
import org.apache.spark.sql.DataFrame

/** Streaming twin of q260's context-length sizing: the per-cap pricing
  * counters (docs, total/truncated/padded/useful tokens) maintained
  * ONLINE as document token counts stream in, with the utilization /
  * truncation-share algebra applied at READ time — the live
  * capacity-planning dial: the sheet stays current as the corpus
  * grows, and adding a cap option only needs a replay of the tiny
  * grid build, never of the corpus.
  *
  * Parity class: all five counters are commutative sums over
  * per-document values, so the streamed grid equals the batch rollup
  * under any arrival order or micro-batch split, and the read-back is
  * pure per-row algebra — batch q260 and the stream share BOTH code
  * paths (sizingGrid / sizingRead). StreamCheck re-asserts full-row
  * equality with batch q260 per round.
  *
  * STATE BOUND (the 100 TB/day contract): |caps| cells of five
  * longs — the literal cap spine, independent of the stream length.
  */
object ContextSizingStream {

  /** The q260 counter grid over a stream of token counts `n`. */
  def grid(lengths: DataFrame, caps: Seq[Long] = Seq(32L, 64L, 128L))
      : DataFrame = CurationQueries.sizingGrid(lengths, caps)

  /** q260's pricing read over stored per-cap cells. */
  def readBack(cells: DataFrame): DataFrame =
    CurationQueries.sizingRead(cells)
}
