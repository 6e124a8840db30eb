package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native replacements for the interpreted higher-order-function folds in
  * the text/vector hot paths (round-2 codegen sweep: an HOF anywhere in a
  * Project knocks the whole operator out of whole-stage codegen, leaving
  * the documents/embeddings workhorse queries interpreted).
  *
  * Every expression here is value-identical to the composed-HOF
  * formulation it replaces — same fold ORDER for IEEE-double parity, same
  * null semantics — property-tested against the composed forms in
  * TextVecSpec, and oracle-verified bit-exactly through the catalog
  * queries that use them.
  */

/** Index-ordered dot product of two ARRAY<DOUBLE> columns. Bit-identical
  * to `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)`: the
  * accumulation is the same left fold (((0+a0b0)+a1b1)+...), a length
  * mismatch or null element yields NULL (zip_with pads with null and a
  * null poisons the sum), null input -> null. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    VecDot.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double $tmp = graft.expressions.VecDot.compute($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Lowercased whitespace tokens of a text column, empties dropped —
  * value-identical to `filter(split(lower(trim(text)), "\\s+"), _ =!= "")`
  * (trim strips 0x20 only, like SQL trim; lower is UTF8String-exact). */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "whitespace_tokens"

  override def nullSafeEval(input: Any): Any =
    WhitespaceTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WhitespaceTokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

object WhitespaceTokens {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String): GenericArrayData = {
    val prepped = s.trim().toLowerCase.toString
    val parts = WS.split(prepped, -1)
    val out = new java.util.ArrayList[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out.add(UTF8String.fromString(parts(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Count of tokens contained in a fixed vocabulary — value-identical to
  * `size(filter(toks, t => t.isin(vocab)))` (null elements not counted). */
case class VocabHits(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vocab_hits"

  private lazy val vocabSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.length * 2)
    vocab.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    VocabHits.compute(input.asInstanceOf[ArrayData], vocabSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VocabHits.compute($c, $vRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabHits =
    copy(child = newChild)
}

object VocabHits {
  def compute(arr: ArrayData, vocab: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && vocab.contains(t)) hits += 1
      i += 1
    }
    hits
  }
}

/** Sum of token character-lengths — value-identical to
  * `aggregate(transform(w, length(t).cast(long)), 0L, _+_)` (null token
  * poisons the sum to NULL; empty array -> 0). */
case class SumTokenLengths(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_token_lengths"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SumTokenLengths.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("stl")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $tmp = graft.expressions.SumTokenLengths.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SumTokenLengths =
    copy(child = newChild)
}

object SumTokenLengths {
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) return null
      acc += t.numChars()
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Polynomial rolling-hash fingerprint over the token stream:
  * h := (h*31 + 7*numChars(t) + codePointAt(t,0)) mod 1e9+7, folded in
  * index order — value-identical to the composed `aggregate` form (and
  * the DuckDB list_reduce oracle). Null token -> NULL; empty array -> 0. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("fp")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $tmp = graft.expressions.RollingFingerprint.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) return null
      val s = t.toString
      val ascii = if (s.isEmpty) 0L else s.codePointAt(0).toLong
      h = (h * 31L + t.numChars().toLong * 7L + ascii) % 1000000007L
      i += 1
    }
    java.lang.Long.valueOf(h)
  }
}
