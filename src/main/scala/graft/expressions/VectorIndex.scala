package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector-index expressions for the ANN operators: per-row cell
  * assignment against a broadcast centroid table (IVF) and banded
  * hyperplane sign codes (LSH). Both are narrow, single-pass projections
  * — no join, no window, no shuffle is involved in computing them — which
  * is what makes the ANN plans hold up at 100 TB: the only exchanges left
  * are the candidate equi-joins on small integer keys.
  *
  * The model tables (centroids / hyperplanes) ride inside the expression
  * as ordinary references, so codegen ships them once per executor like
  * any broadcast literal, not per row.
  */

/** Indices of the `nProbe` nearest centroids by dot product (descending,
  * ties broken by lower cell index). Centroids must be L2-normalized so
  * dot order equals cosine order; the input vector need not be (its norm
  * is a per-row constant and cannot change the argmax). Null input array
  * -> null (standard unary propagation); null elements are treated as 0.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty, "nearest_cells: empty centroid table")
  require(nProbe >= 1 && nProbe <= centroids.length, "nearest_cells: bad nProbe")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(input: Any): Any =
    NearestCells.compute(input.asInstanceOf[ArrayData], centroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NearestCells.compute($c, $cRef, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def compute(arr: ArrayData, cents: Array[Array[Double]], nProbe: Int): GenericArrayData = {
    val k = cents.length
    val dots = new Array[Double](k)
    val n = arr.numElements()
    val dim = cents(0).length
    if (n != dim) throw new IllegalArgumentException(
      s"nearest_cells: input vector has $n elements but the centroid table is " +
        s"$dim-dimensional — a silent truncation here would assign plausible " +
        "but wrong cells")
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val x = arr.getDouble(j)
        var c = 0
        while (c < k) {
          dots(c) += x * cents(c)(j)
          c += 1
        }
      }
      j += 1
    }
    // partial selection sort: k is small (O(sqrt(corpus cells) per probe
    // set)), nProbe smaller still
    val out = new Array[Any](nProbe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var c = 0
      while (c < k) {
        if (!taken(c) && (best < 0 || dots(c) > dots(best))) best = c
        c += 1
      }
      taken(best) = true
      out(p) = java.lang.Integer.valueOf(best)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-band hyperplane sign codes: `bands` longs, band b's bit j set when
  * dot(v, planes[b*planesPerBand + j]) >= 0. One pass over the vector
  * computes every plane's dot product, replacing bands*planes interpreted
  * higher-order-function folds. planes.length must be a multiple of
  * `bands`. Null input -> null; null elements treated as 0.
  */
case class BandedHyperplaneCodes(child: Expression, planes: Array[Array[Double]], bands: Int)
    extends UnaryExpression {
  require(bands >= 1 && planes.length % bands == 0,
    "banded_hyperplane_codes: planes.length must be a multiple of bands")
  require(planes.length / bands <= 64,
    s"banded_hyperplane_codes: ${planes.length / bands} planes per band exceed " +
      "a 64-bit code (1L << j wraps at 64 and would silently alias sign bits)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "banded_hyperplane_codes"

  override def nullSafeEval(input: Any): Any =
    BandedHyperplaneCodes.compute(input.asInstanceOf[ArrayData], planes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BandedHyperplaneCodes.compute($c, $pRef, $bands);")
  }

  override protected def withNewChildInternal(newChild: Expression): BandedHyperplaneCodes =
    copy(child = newChild)
}

object BandedHyperplaneCodes {
  def compute(arr: ArrayData, planes: Array[Array[Double]], bands: Int): GenericArrayData = {
    val np = planes.length
    val r = np / bands
    val dots = new Array[Double](np)
    val n = arr.numElements()
    val dim = planes(0).length
    if (n != dim) throw new IllegalArgumentException(
      s"banded_hyperplane_codes: input vector has $n elements but the " +
        s"hyperplane table is $dim-dimensional")
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val x = arr.getDouble(j)
        var p = 0
        while (p < np) {
          dots(p) += x * planes(p)(j)
          p += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var code = 0L
      var j2 = 0
      while (j2 < r) {
        if (dots(b * r + j2) >= 0) code |= (1L << j2)
        j2 += 1
      }
      out(b) = java.lang.Long.valueOf(code)
      b += 1
    }
    new GenericArrayData(out)
  }
}
