package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation surface (SURVEY.md §7.5): a single-pass
  * numeric-stats sketch as an `Aggregator[IN, BUF, OUT]`, exposed as a
  * UDAF via `functions.udaf`. Deliberately computes quantities with exact
  * built-in equivalents (count/sum/min/max) so the extension mechanism
  * itself is DuckDB-oracle-verifiable — the pattern a production sketch
  * (t-digest, HLL variant, reservoir) would follow.
  *
  * Null semantics match the built-ins exactly: NULL inputs are skipped
  * (boxed `java.lang.Double` input so nulls reach `reduce` instead of
  * being coerced to 0.0), and an empty/all-null group yields n=0 with
  * NULL sum/min/max — the same shape `count`/`sum`/`min`/`max` return.
  */
final case class NumStats(n: Long, sum: Option[Double], min: Option[Double], max: Option[Double])

object StatsAggregator extends Aggregator[java.lang.Double, NumStats, NumStats] {
  override def zero: NumStats = NumStats(0L, None, None, None)

  override def reduce(b: NumStats, x: java.lang.Double): NumStats =
    if (x == null) b // built-in aggregates skip NULL inputs
    else {
      val v = x.doubleValue
      NumStats(b.n + 1,
        Some(b.sum.fold(v)(_ + v)),
        Some(b.min.fold(v)(math.min(_, v))),
        Some(b.max.fold(v)(math.max(_, v))))
    }

  override def merge(a: NumStats, b: NumStats): NumStats =
    NumStats(a.n + b.n,
      mergeWith(a.sum, b.sum)(_ + _),
      mergeWith(a.min, b.min)(math.min),
      mergeWith(a.max, b.max)(math.max))

  private def mergeWith(a: Option[Double], b: Option[Double])(f: (Double, Double) => Double) =
    (a, b) match {
      case (Some(x), Some(y)) => Some(f(x, y))
      case _                  => a.orElse(b)
    }

  override def finish(r: NumStats): NumStats = r

  override def bufferEncoder: Encoder[NumStats] = Encoders.product[NumStats]
  override def outputEncoder: Encoder[NumStats] = Encoders.product[NumStats]
}
