package graft.streaming

import graft.operators.CurationQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q251's Condorcet/Copeland ranking: the per-pair
  * directional win counters maintained ONLINE as duel outcomes stream
  * in (the live arena-leaderboard pattern), with the Copeland fold —
  * head-to-head verdicts, point sums, the Condorcet flag — applied at
  * READ time over the stored cells.
  *
  * Parity class: duel counts commute, so the streamed pair grid equals
  * the batch duel aggregate under any arrival order or micro-batch
  * split; the read-back shares q251's exact code path
  * (copelandFromPairs), and its verdicts are invariant under the
  * symmetric Laplace smoothing the batch side's persisted pair matrix
  * carries (w_uv+1 > w_vu+1 iff w_uv > w_vu) — so stream output ==
  * batch q251 rows exactly, which StreamCheck re-asserts per round.
  *
  * STATE BOUND (the 100 TB/day contract): one (w_uv, w_vu) cell per
  * co-dueling ITEM PAIR — the sparse pair domain (basket-bounded,
  * like q102's edge projection), independent of the stream length.
  */
object CopelandStream {

  /** The per-pair directional counter grid over a (w, l) duel stream —
    * canonical u < v orientation, counts commute. */
  def grid(duels: DataFrame): DataFrame =
    duels
      .groupBy(least(col("w"), col("l")).as("u"),
        greatest(col("w"), col("l")).as("v"))
      .agg(sum(when(col("w") < col("l"), 1L).otherwise(0L))
        .cast("long").as("w_uv"),
        sum(when(col("w") > col("l"), 1L).otherwise(0L))
        .cast("long").as("w_vu"))

  /** q251's Copeland fold over stored pair cells. */
  def readBack(cells: DataFrame, k: Int = 20): DataFrame =
    CurationQueries.copelandFromPairs(cells, k)
}
