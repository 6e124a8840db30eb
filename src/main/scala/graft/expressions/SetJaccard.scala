package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two pre-distinct string arrays in one pass:
  * |A n B| / (|A| + |B| - |A n B|).
  *
  * Value-identical to
  * `size(array_intersect(a,b)) / size(array_distinct(concat(a,b)))` for
  * distinct inputs (and to the DuckDB list_intersect/list_concat oracle
  * form), but a single hash-set probe instead of three interpreted
  * array-function passes — the pairwise-similarity inner loop is the
  * hottest path of exact near-dup confirmation.
  */
case class SetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "set_jaccard"
  // 0/0 (two empty sets) yields NULL like SQL division
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    SetJaccard.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("jac")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double $tmp = graft.expressions.SetJaccard.compute($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SetJaccard =
    copy(left = newLeft, right = newRight)
}

object SetJaccard {
  /** Shared eval body for interpreted + generated paths; null for 0/0. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la == 0 && lb == 0) return null
    val set = new java.util.HashSet[UTF8String](la * 2)
    var i = 0
    while (i < la) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < lb) { if (set.contains(b.getUTF8String(i))) inter += 1; i += 1 }
    java.lang.Double.valueOf(inter.toDouble / (la + lb - inter).toDouble)
  }
}
