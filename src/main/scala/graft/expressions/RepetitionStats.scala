package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics in ONE pass — the
  * Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
  * Language Models", table A1) every pretraining corpus filter computes:
  * for the document's non-distinct n-gram multiset,
  *
  *   n_grams    — total n-gram occurrences (len(words) - n + 1),
  *   top_count  — occurrences of the most frequent n-gram,
  *   dup_grams  — total occurrences of n-grams appearing more than once.
  *
  * top_count/n_grams is the "fraction of text in the most common n-gram"
  * signal; dup_grams/n_grams the "fraction in duplicated n-grams" one.
  *
  * The naive Spark formulation is explode -> groupBy(doc, gram) ->
  * groupBy(doc) — two shuffles of the FULL gram stream (at 100 TB, the
  * gram stream is ~n x the corpus). But the computation is doc-local by
  * definition, so this expression keeps it inside the row: tokenize
  * (same semantics as [[WordShingles]]/the q34 oracle fragment), slide,
  * count into a hash map, fold the three outputs. Zero shuffles, and it
  * participates in whole-stage codegen via the shared static helper.
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = RepetitionStats.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RepetitionStats.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("dup_grams", LongType, nullable = false)))

  // String.split("\\s+") recompiles the Pattern per row; hoist it out of
  // the codegen'd hot path (Pattern.split with limit 0 is value-identical).
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Shared eval body — called from both interpreted eval and generated
    * code (static forwarder keeps the codegen call a plain Java call). */
  def compute(input: UTF8String, n: Int): InternalRow = {
    val toks = WS.split(input.toString.trim.toLowerCase(java.util.Locale.ROOT))
    val words = if (toks.length == 1 && toks(0).isEmpty) Array.empty[String] else toks
    if (words.length < n)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Int](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any]((words.length - n + 1).toLong, top, dup))
  }
}
