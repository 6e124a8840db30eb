package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives for the compressed-ANN path (q268):
  * per-row code assignment against broadcast codebooks and ADC
  * (asymmetric-distance) scoring against per-query lookup tables. Both
  * are narrow single-pass projections — like NearestCells /
  * BandedHyperplaneCodes, the model tables ride inside the expression as
  * reference objects, shipped once per executor, so encoding and scoring
  * a 100 TB corpus is join-free and shuffle-free; the only exchanges in
  * a PQ plan are over the thin (qid, vid, score) frames downstream.
  */

/** Packed PQ code of a vector: for each of the `m = codebooks.length`
  * subspaces, the index of the L2-nearest codebook centroid of the UNIT
  * vector's subvector (the norm rides in as the second child so the
  * division happens inside the one pass — quantizing directions is what
  * makes ADC inner products approximate cosine). Codes are packed
  * little-endian into one LONG at ceil(log2(ksub)) bits each — a 64-dim
  * float32 embedding (256 B) compresses to m*bits bits (4 B at
  * m=8, ksub=16), the memory economics that let a PQ scan hold 100 TB of
  * vectors in RAM-sized codes.
  *
  * Ties go to the lower code index (strict `<` improvement), empty cells
  * are impossible by construction (the trainer keeps a starved cell's old
  * centroid). Null vector or non-positive/NaN norm -> null; null elements
  * are treated as 0 (NearestCells' convention).
  */
case class PqEncodePacked(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]]) extends BinaryExpression {
  PqEncodePacked.validate(codebooks)
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode_packed"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, nrm: Any): Any =
    PqEncodePacked.compute(
      v.asInstanceOf[ArrayData], nrm.asInstanceOf[Double], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val tmp = ctx.freshName("pqcode")
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"""java.lang.Long $tmp = graft.expressions.PqEncodePacked.compute($v, $n, $bRef);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodePacked =
    copy(left = newLeft, right = newRight)
}

object PqEncodePacked {
  /** Bits per packed code: ceil(log2(ksub)), min 1. */
  def bitsPerCode(ksub: Int): Int =
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros((ksub - 1).toLong).toInt)

  private[graft] def validate(books: Array[Array[Array[Double]]]): Unit = {
    require(books.nonEmpty, "pq_encode: no subspaces")
    val ksub = books(0).length
    require(ksub >= 1, "pq_encode: empty codebook")
    require(books.forall(_.length == ksub),
      "pq_encode: ragged codebooks — every subspace must share one ksub " +
        "(the packed-code bit layout depends on it)")
    require(books.length * bitsPerCode(ksub) <= 64,
      s"pq_encode: ${books.length} subspaces x ${bitsPerCode(ksub)} bits " +
        "overflow a 64-bit packed code")
  }

  def compute(arr: ArrayData, nrm: Double,
      books: Array[Array[Array[Double]]]): java.lang.Long = {
    if (!(nrm > 0) || java.lang.Double.isInfinite(nrm)) return null
    val m = books.length
    val ksub = books(0).length
    val bits = bitsPerCode(ksub)
    var dim = 0
    var s = 0
    while (s < m) { dim += books(s)(0).length; s += 1 }
    if (arr.numElements() != dim) throw new IllegalArgumentException(
      s"pq_encode: input vector has ${arr.numElements()} elements but the " +
        s"codebooks cover $dim dims — a silent truncation would assign " +
        "plausible but wrong codes")
    var packed = 0L
    var off = 0
    s = 0
    while (s < m) {
      val book = books(s)
      val dsub = book(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val cent = book(c)
        var dist = 0.0
        var j = 0
        while (j < dsub) {
          val x = (if (arr.isNullAt(off + j)) 0.0 else arr.getDouble(off + j)) / nrm
          val d = x - cent(j)
          dist += d * d
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      packed |= best.toLong << (s * bits)
      off += dsub
      s += 1
    }
    java.lang.Long.valueOf(packed)
  }
}

/** ADC scores of one packed code against EVERY query's lookup table:
  * element q of the output is sum over subspaces s of
  * `tables(q)(s*ksub + code_s)` — the inner product of query q's unit
  * vector with the code's reconstruction, i.e. the PQ estimate of
  * cos(q, v). All query tables ride as ONE reference object (bounded by
  * the query-batch size), so scoring the whole corpus against the whole
  * query batch is a single narrow projection — no join of any kind.
  * Null code -> null.
  */
case class PqAdcScores(child: Expression, tables: Array[Array[Double]],
    m: Int, ksub: Int) extends UnaryExpression {
  require(m >= 1, "pq_adc: m must be >= 1")
  require(ksub >= 1, "pq_adc: ksub must be >= 1")
  require(tables.nonEmpty, "pq_adc: no query tables")
  // exact m*ksub, not just divisible (see PqAdcScore.compute)
  require(tables.forall(_.length == m * ksub),
    s"pq_adc: every table must be the exact m=$m x ksub=$ksub flat layout")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_scores"

  override def nullSafeEval(codes: Any): Any =
    PqAdcScores.compute(codes.asInstanceOf[Long], tables, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("tables", tables, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqAdcScores.compute($c, $tRef, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScores =
    copy(child = newChild)
}

/** ADC score of one packed code against ONE table carried as a column
  * (the joined form, for plans where the query side arrives via an
  * equi-join — q269's IVF-restricted candidates): sum over subspaces s
  * of `table[s*ksub + code_s]`. The table column must be the flat
  * m*ksub layout of [[graft.functions.ProductQuantizer.adcTable]]; a
  * width that does not divide by ksub throws loudly (an internal frame
  * bug, never data). Null code or table -> null; a null table ELEMENT
  * -> null (VecDot's poison discipline).
  */
case class PqAdcScore(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {
  require(m >= 1, "pq_adc_score: m must be >= 1")
  require(ksub >= 1, "pq_adc_score: ksub must be >= 1")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"
  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any, table: Any): Any =
    PqAdcScore.compute(codes.asInstanceOf[Long], table.asInstanceOf[ArrayData], m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("adc")
    nullSafeCodeGen(ctx, ev, (c, t) =>
      s"""java.lang.Double $tmp = graft.expressions.PqAdcScore.compute($c, $t, $m, $ksub);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def compute(codes: Long, table: ArrayData, m: Int, ksub: Int): java.lang.Double = {
    val len = table.numElements()
    // exact m*ksub, not just divisible: a ksub mismatched to the table's
    // real layout could still divide its length and would read garbage
    // offsets silently
    if (len != m * ksub) throw new IllegalArgumentException(
      s"pq_adc_score: table of $len entries is not the m=$m x ksub=$ksub layout")
    val bits = PqEncodePacked.bitsPerCode(ksub)
    val mask = (1L << bits) - 1L
    var acc = 0.0
    var s = 0
    while (s < m) {
      val idx = s * ksub + ((codes >>> (s * bits)) & mask).toInt
      if (table.isNullAt(idx)) return null
      acc += table.getDouble(idx)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

object PqAdcScores {
  def compute(codes: Long, tables: Array[Array[Double]], ksub: Int): GenericArrayData = {
    val bits = PqEncodePacked.bitsPerCode(ksub)
    val mask = (1L << bits) - 1L
    val m = tables(0).length / ksub
    val out = new Array[Any](tables.length)
    var q = 0
    while (q < tables.length) {
      val t = tables(q)
      var acc = 0.0
      var s = 0
      while (s < m) {
        val code = ((codes >>> (s * bits)) & mask).toInt
        acc += t(s * ksub + code)
        s += 1
      }
      out(q) = java.lang.Double.valueOf(acc)
      q += 1
    }
    new GenericArrayData(out)
  }
}
