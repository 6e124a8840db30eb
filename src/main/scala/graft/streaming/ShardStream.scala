package graft.streaming

import graft.operators.WarehouseQueries
import org.apache.spark.sql.DataFrame

/** Streaming twin of q228's rendezvous-sharding audit: the movement
  * grid maintained ONLINE as docs stream in — the HRW election is a
  * pure per-row expression, so the twin is one built-in streaming
  * aggregation in Complete mode (the ForecastStream/CalibrationStream
  * grid class), with q228's flags/shares decoration applied at READ
  * time over the stored cells.
  *
  * Parity class: cell counts commute, so the streamed grid equals the
  * batch rollup regardless of arrival order or micro-batch split, and
  * the read-back (total, flags, shares) is pure algebra over the grid —
  * batch and stream share both code paths (shardGrid / shardGridReadBack).
  * StreamCheck re-asserts full-row equality with batch q228 per round.
  *
  * STATE BOUND (the 100 TB/day contract): <= before x after cells
  * (8 x 9 = 72 here) — constant, independent of the stream. */
object ShardStream {

  /** The q228 movement grid — shared election, batch and streaming. */
  def grid(docs: DataFrame, before: Int = 8, after: Int = 9): DataFrame =
    WarehouseQueries.shardGrid(docs, before, after)

  /** q228's flags/shares decoration over stored (wb, wa, n_docs). */
  def readBack(cells: DataFrame, after: Int = 9): DataFrame =
    WarehouseQueries.shardGridReadBack(cells, after)
}
