package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass second-moment sketch over d-dimensional vectors — the
  * distributed half of covariance/PCA at scale: each partition folds its
  * vectors into ONE (1 + d + d(d+1)/2)-double buffer
  * [n, Σx_i, Σx_i·x_j upper triangle], merge is elementwise addition, and
  * the full covariance matrix is then closed-form over the final buffer.
  * At 100 TB this is a map-side-combined aggregate whose shuffle payload
  * is a few KB per partition (d=64 -> 2145 doubles) — the classic
  * treeAggregate shape for Gram/covariance accumulation, never a
  * d^2 x N explode-join.
  *
  * FP note: partial-sum ORDER follows partition layout, so repeated runs
  * agree only to accumulation-error scale (~1e-12 relative at sf scales);
  * consumers that publish covariance entries round them (the q51 rule),
  * and the PCA consumer tolerances sit far above ulp noise.
  */
final class CovMoments(val d: Int)
    extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Double] = new Array[Double](len)

  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    if (v == null) return b // skip NULL rows like the built-in aggregates
    require(v.length == d, s"CovMoments(d=$d) fed a ${v.length}-dim vector")
    val x = v.toArray
    b(0) += 1.0
    var i = 0
    var k = 1 + d
    while (i < d) {
      b(1 + i) += x(i)
      var j = i
      while (j < d) {
        b(k) += x(i) * x(j)
        j += 1; k += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Double]): Array[Double] = r

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object CovMoments {

  /** Buffer offset of Σx_i·x_j for i <= j (0-based i, j). */
  def triOffset(d: Int, i: Int, j: Int): Int =
    1 + d + (i * d - i * (i - 1) / 2) + (j - i)

  /** Sample covariance matrix (d x d, symmetric) from a finished buffer:
    * cov(i,j) = (Σxy - Σx·Σy/n) / (n-1). */
  def covarianceMatrix(m: Array[Double], d: Int): Array[Array[Double]] = {
    val n = m(0)
    require(n >= 2.0, s"covariance needs n >= 2, got $n")
    val c = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = (m(triOffset(d, i, j)) - m(1 + i) * m(1 + j) / n) / (n - 1.0)
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    c
  }

  /** Column means from a finished buffer. */
  def means(m: Array[Double], d: Int): Array[Double] =
    Array.tabulate(d)(i => m(1 + i) / m(0))
}

/** Integer-exact second-moment sketch: the [[CovMoments]] buffer layout
  * over PRE-SCALED int64 components. Callers fix-point the input
  * (component -> round(x * scale) as long) so every partial sum is exact
  * integer arithmetic — partition count and fold order can no longer
  * perturb the result, which is what makes a published covariance entry
  * bit-reproducible across engines (the q95 fixed-point recipe applied
  * to covariance; see q77).
  *
  * Overflow headroom: with |x| <= 1e6 x max|v| ~ 6e5 per component, a
  * product is <= ~4e11 and the triangle sums stay ~5e15 even at the sf1
  * replication gate (2e4 vectors) — three orders of magnitude under
  * int64. The 128-bit closed form (n*Sxy - Sx*Sy) is done downstream in
  * decimal arithmetic, not here.
  */
final class CovMomentsExact(val d: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(b: Array[Long], v: Seq[Long]): Array[Long] = {
    if (v == null) return b // skip NULL rows like the built-in aggregates
    require(v.length == d, s"CovMomentsExact(d=$d) fed a ${v.length}-dim vector")
    val x = v.toArray
    b(0) += 1L
    var i = 0
    var k = 1 + d
    while (i < d) {
      b(1 + i) += x(i)
      var j = i
      while (j < d) {
        b(k) += x(i) * x(j)
        j += 1; k += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
