package graft.streaming

import graft.operators.TemporalQueries
import org.apache.spark.sql.DataFrame

/** Streaming twin of q220's Holt walk-forward backtest: the monthly
  * revenue grid maintained ONLINE as a streaming aggregation over
  * arriving orders — a plain groupBy sum in Complete mode (built-in
  * incremental aggregation state, exactly like the q206
  * CalibrationStream grid), with q220's level/trend fold applied at
  * READ time over the stored cells.
  *
  * Parity class: cent sums commute, so the streamed grid equals the
  * batch rollup REGARDLESS of arrival order or micro-batch split, and
  * the read-back fold — per-month walk-forward state over the strict
  * prefix — is pure algebra over the grid, so a deployed forecaster
  * derives every q220 row from ~tens of stored integers-as-doubles.
  * StreamCheck re-asserts full-row equality with batch q220 per round.
  *
  * STATE BOUND (the 100 TB/day contract): one cell per CALENDAR MONTH
  * — state grows with the calendar, not the stream; the read-back
  * fold is O(T^2) on that calendar-bounded frame. */
object ForecastStream {

  /** The q220 month grid — shared fold, batch and streaming. */
  def monthCells(orders: DataFrame): DataFrame =
    TemporalQueries.monthGrid(orders)

  /** q220's walk-forward read-back over a (m, y) cells frame. */
  def readBack(cells: DataFrame): DataFrame =
    TemporalQueries.holtFold(cells)
}
