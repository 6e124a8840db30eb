package graft.streaming

import graft.operators.CurationQueries
import org.apache.spark.sql.DataFrame

/** Streaming twin of q249's pass@k estimation: the per-task (n, c)
  * sample counters maintained ONLINE as eval samples stream in, with
  * the Codex estimator (the telescoped five-division product) applied
  * at READ time over the stored cells — the live eval-leaderboard
  * pattern: state holds raw counters, every read derives the metric,
  * so a changed k never needs a replay.
  *
  * Parity class: sample counts commute, so the streamed grid equals
  * the batch rollup regardless of arrival order or micro-batch split,
  * and the read-back is pure per-row algebra — batch q249 and the
  * stream share BOTH code paths (passTaskGrid / passAtKRead).
  * StreamCheck re-asserts full-row equality with batch q249 per round.
  *
  * STATE BOUND (the 100 TB/day contract): |tasks| cells of two longs —
  * the task domain, independent of the stream length.
  */
object PassAtKStream {

  /** The q249 counter grid — shared rollup, batch and streaming. */
  def grid(samples: DataFrame): DataFrame =
    CurationQueries.passTaskGrid(samples)

  /** q249's estimator read over stored (task, n, c) cells. */
  def readBack(cells: DataFrame, k: Int = 5): DataFrame =
    CurationQueries.passAtKRead(cells, k)
}
