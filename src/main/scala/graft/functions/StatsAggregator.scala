package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation surface (SURVEY.md §7.5): a single-pass
  * numeric-stats sketch as an `Aggregator[IN, BUF, OUT]`, exposed as a
  * UDAF via `functions.udaf`. Deliberately computes quantities with exact
  * built-in equivalents (count/sum/min/max) so the extension mechanism
  * itself is DuckDB-oracle-verifiable — the pattern a production sketch
  * (t-digest, HLL variant, reservoir) would follow.
  */
final case class NumStats(n: Long, sum: Double, min: Double, max: Double)

object StatsAggregator extends Aggregator[Double, NumStats, NumStats] {
  override def zero: NumStats = NumStats(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  override def reduce(b: NumStats, x: Double): NumStats =
    NumStats(b.n + 1, b.sum + x, math.min(b.min, x), math.max(b.max, x))

  override def merge(a: NumStats, b: NumStats): NumStats =
    NumStats(a.n + b.n, a.sum + b.sum, math.min(a.min, b.min), math.max(a.max, b.max))

  override def finish(r: NumStats): NumStats =
    if (r.n == 0) NumStats(0L, 0.0, 0.0, 0.0) else r

  override def bufferEncoder: Encoder[NumStats] = Encoders.product[NumStats]
  override def outputEncoder: Encoder[NumStats] = Encoders.product[NumStats]
}
