package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data layout: interleave
  * the low 16 bits of two non-negative dimensions into one 32-bit key so
  * that sorting by the key clusters rows into rectangles of BOTH
  * dimensions at once. Files written in z order carry tight min/max
  * footer stats on every participating column, so a scan with predicates
  * on either (or both) dimensions skips most files — the property a
  * single-column sort gives only to its one leading column. This is how
  * a 100 TB table serves two independent access paths without storing a
  * second copy.
  *
  * Like [[DeterministicHash]], ONE bit-interleave definition generates
  * both dialects (the Spark Column and the oracle SQL string) from the
  * same loop, so the two sides cannot drift. All arithmetic is int64
  * shifts/masks on values pre-masked to 16 bits — no overflow anywhere
  * (max z-value is 2^32 - 1), and identical in any engine.
  */
object ZOrder {
  val bitsPerDim = 16

  /** z(x, y) with x in even bit positions, y in odd. Inputs are masked to
    * the low 16 bits first: callers at a wider domain should pre-scale
    * (the layout only needs rank order to be roughly preserved, so
    * dividing a wider domain down to 16 bits keeps the curve useful). */
  def zValue(x: Column, y: Column): Column = {
    val xm = x.bitwiseAND(lit(65535L))
    val ym = y.bitwiseAND(lit(65535L))
    (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Min-max scale an integer expression onto the full 16-bit domain —
    * REQUIRED before interleaving whenever the two dimensions' ranges are
    * not already bit-aligned: with raw values, whichever dimension owns
    * the highest varying bit dominates the curve and the layout
    * degenerates to a single-column sort of that dimension (caught by
    * ZOrderSpec on (custkey ~8 bits, epoch-day ~15 bits with constant
    * high bits)). Emitted as dialect-neutral SQL: pass "div" for Spark's
    * `expr` parser and "//" for DuckDB; both floor for the non-negative
    * operands scaling produces. Overflow-safe while (x - lo) < 2^47. */
  def scale16Sql(x: String, lo: String, hi: String, intDiv: String): String =
    s"(CASE WHEN ($hi) = ($lo) THEN 0 " +
      s"ELSE ((($x) - ($lo)) * 65535) $intDiv (($hi) - ($lo)) END)"

  /** The identical computation as oracle SQL over two int expressions.
    * Every term is FULLY parenthesized including its final shift:
    * DuckDB/PostgreSQL give all bitwise operators one shared precedence
    * level, left-associative, so an unparenthesized `a << 2 | b << 3`
    * parses as `((a << 2) | b) << 3` and chain-shifts into overflow. */
  def zValueSql(xExpr: String, yExpr: String): String = {
    val terms = (0 until bitsPerDim).flatMap { i =>
      Seq(
        s"(((($xExpr & 65535) >> $i) & 1) << ${2 * i})",
        s"(((($yExpr & 65535) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Reference implementation for tests (same arithmetic, plain Scala). */
  def zValueLocal(x: Long, y: Long): Long = {
    val xm = x & 65535L
    val ym = y & 65535L
    (0 until bitsPerDim).foldLeft(0L) { (acc, i) =>
      acc | (((xm >> i) & 1L) << (2 * i)) | (((ym >> i) & 1L) << (2 * i + 1))
    }
  }
}
