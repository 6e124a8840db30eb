package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of an ARRAY<DOUBLE> column as a typed Aggregator —
  * the distributed centroid computation done the scalable way: ONE pass,
  * fixed-size buffer (count + running sum vector), map-side partial
  * aggregation before the shuffle. The alternative (posexplode to
  * (row, dim) pairs then groupBy(dim)) multiplies the shuffle by the
  * vector width; this ships exactly one vector per partition per group.
  *
  * Null/empty semantics: null and empty input vectors are skipped (like
  * built-in aggregates skip NULL); an all-null group yields an empty
  * array. Mixed dimensionalities fold the overlapping prefix (inputs are
  * fixed-width in practice).
  */
final case class VecSumBuf(n: Long, sum: Array[Double])

object VecMeanAggregator extends Aggregator[Seq[Double], VecSumBuf, Seq[Double]] {
  override def zero: VecSumBuf = VecSumBuf(0L, Array.empty)

  override def reduce(b: VecSumBuf, v: Seq[Double]): VecSumBuf =
    if (v == null || v.isEmpty) b
    else if (b.n == 0L) VecSumBuf(1L, v.toArray)
    else VecSumBuf(b.n + 1, addInto(b.sum, v))

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else VecSumBuf(a.n + b.n, addInto(a.sum, b.sum.toSeq))

  override def finish(r: VecSumBuf): Seq[Double] =
    if (r.n == 0L) Seq.empty else r.sum.map(_ / r.n).toSeq

  private def addInto(acc: Array[Double], v: Seq[Double]): Array[Double] = {
    val out = acc.clone()
    var i = 0
    val n = math.min(out.length, v.length)
    while (i < n) { out(i) += v(i); i += 1 }
    out
  }

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
