package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-size token chunks of a text column in one pass — the
  * document-splitting step of a pretraining pipeline (long documents
  * become training-window-sized pieces; the last chunk may be short).
  * Tokenization is the shared whitespace convention
  * ([[WordShingles]]/[[WhitespaceTokens]] and the q34/q67 oracle
  * fragment): trim, lowercase, split on whitespace runs, drop empties.
  *
  * Returns the chunks as space-joined strings, in order; an empty or
  * whitespace-only document yields an empty array (no chunks). One
  * tight loop per row, codegen-participating via the static helper —
  * the composed `transform(sequence(...), i -> concat_ws(' ',
  * slice(w, ...)))` formulation would run interpreted lambdas with
  * per-element boxing.
  */
case class ChunkTokens(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"chunk size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "chunk_tokens"

  override def nullSafeEval(input: Any): Any =
    ChunkTokens.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ChunkTokens.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ChunkTokens =
    copy(child = newChild)
}

object ChunkTokens {
  // String.split("\\s+") recompiles the Pattern per row; hoist it out of
  // the codegen'd hot path (Pattern.split with limit 0 is value-identical).
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Shared eval body — called from both interpreted eval and generated
    * code (static forwarder keeps the codegen call a plain Java call). */
  def compute(input: UTF8String, k: Int): GenericArrayData = {
    val toks = WS.split(input.toString.trim.toLowerCase(java.util.Locale.ROOT))
    val words = if (toks.length == 1 && toks(0).isEmpty) Array.empty[String] else toks
    if (words.length == 0) return new GenericArrayData(Array.empty[Any])
    val nChunks = (words.length + k - 1) / k
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder(64)
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      var i = c * k
      val end = math.min(i + k, words.length)
      while (i < end) {
        if (i > c * k) sb.append(' ')
        sb.append(words(i))
        i += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }
}
