package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Range-bucket id against a sorted literal boundary array: the count
  * of boundaries strictly below (asc) / above (desc) the child value —
  * RangeRank's bucket function as one codegen'd binary search
  * (O(log B)) instead of an interpreted O(B) higher-order array
  * filter, which at B=128 dominated the rank's per-row cost (measured
  * ~1.1 s of the q106 sf0.1 wall before this expression).
  *
  * Exactly `size(filter(lit(bounds), b -> b < v))` (asc) /
  * `size(filter(lit(bounds), b -> b > v))` (desc) for a sorted
  * non-decreasing `bounds`: lowerBound(v) counts elements < v;
  * n - upperBound(v) counts elements > v. Duplicate boundary values
  * (heavy-hitter quantiles) just yield empty buckets, never a
  * membership disagreement.
  */
case class RangeBucket(child: Expression, bounds: Array[Double],
    desc: Boolean) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket"

  override def nullSafeEval(v: Any): Any =
    RangeBucket.compute(v.asInstanceOf[Double], bounds, desc)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RangeBucket.compute($c, $ref, $desc);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RangeBucket = copy(child = newChild)
}

object RangeBucket {
  /** Shared eval body for interpreted + generated paths. */
  def compute(v: Double, bounds: Array[Double], desc: Boolean): Int = {
    var lo = 0
    var hi = bounds.length
    if (desc) {
      // first index with bounds(i) > v; count above = n - that index
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bounds(mid) > v) hi = mid else lo = mid + 1
      }
      bounds.length - lo
    } else {
      // first index with bounds(i) >= v == count of elements < v
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bounds(mid) < v) lo = mid + 1 else hi = mid
      }
      lo
    }
  }
}
