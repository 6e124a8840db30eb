package graft.extensions

import graft.expressions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseXor, Cast, Expression, ExpressionInfo, Literal, Sqrt}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SQL surface for the engine's native expressions (the
  * SparkSessionExtensions rung of the custom-operator ladder, SURVEY
  * §4.2): registers every graft expression as a SQL function so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works for users who never
  * touch the Scala DSL.
  *
  * Two activation paths, same function table:
  *   - config: `spark.sql.extensions=graft.extensions.GraftExtensions`
  *     (cluster-wide, at session build);
  *   - programmatic: `GraftExtensions.register(spark)` on a live session
  *     (REPL / notebook).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register the function table on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType, containsNull = true))

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $other")
  }

  private def litStrings(e: Expression, fn: String): Seq[String] = e match {
    // Element type matters: array(1, 2) is a foldable ArrayType too, and
    // blindly calling getUTF8String on ints would die with an opaque
    // ClassCastException instead of the classified error below. NullType
    // elements stay accepted: the empty literal array() types as
    // ARRAY<NULL> and must keep meaning "zero vocab entries" (non-empty
    // all-NULL arrays still hit the null-element require below).
    case l if l.foldable && l.dataType.isInstanceOf[ArrayType] &&
        (l.dataType.asInstanceOf[ArrayType].elementType == StringType ||
          l.dataType.asInstanceOf[ArrayType].elementType == NullType) =>
      val arr = l.eval().asInstanceOf[ArrayData]
      require(arr != null, s"$fn: the array literal itself is NULL")
      (0 until arr.numElements()).map { i =>
        val s = arr.getUTF8String(i)
        require(s != null, s"$fn: array literal contains a NULL element at index $i")
        s.toString
      }
    case other => throw new IllegalArgumentException(
      s"$fn: expected a foldable string-array literal, got $other")
  }

  private def nArgs(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn: expected $n arguments, got ${args.length}")

  private def fd(name: String, clazz: Class[_], builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  /** The full SQL function table. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fd("vec_dot", classOf[VecDot], args => {
      nArgs("vec_dot", args, 2)
      VecDot(toDoubleArray(args(0)), toDoubleArray(args(1)))
    }),
    fd("vec_norm", classOf[VecDot], args => {
      nArgs("vec_norm", args, 1)
      val v = toDoubleArray(args(0))
      Sqrt(VecDot(v, v))
    }),
    fd("set_jaccard", classOf[SetJaccard], args => {
      nArgs("set_jaccard", args, 2)
      SetJaccard(args(0), args(1))
    }),
    fd("word_shingles", classOf[WordShingles], args => {
      nArgs("word_shingles", args, 2)
      WordShingles(args(0), litInt(args(1), "word_shingles"))
    }),
    fd("minhash_signature", classOf[MinHashSignature], args => {
      nArgs("minhash_signature", args, 2)
      MinHashSignature(args(0), litInt(args(1), "minhash_signature"))
    }),
    fd("simhash64", classOf[SimHash64], args => {
      nArgs("simhash64", args, 1)
      SimHash64(args(0))
    }),
    fd("hamming64", classOf[SimHash64], args => {
      nArgs("hamming64", args, 2)
      org.apache.spark.sql.catalyst.expressions.BitwiseCount(BitwiseXor(args(0), args(1)))
    }),
    fd("whitespace_tokens", classOf[WhitespaceTokens], args => {
      nArgs("whitespace_tokens", args, 1)
      WhitespaceTokens(args(0))
    }),
    fd("vocab_hits", classOf[VocabHits], args => {
      nArgs("vocab_hits", args, 2)
      VocabHits(args(0), litStrings(args(1), "vocab_hits"))
    }),
    fd("chunk_tokens", classOf[ChunkTokens], args => {
      nArgs("chunk_tokens", args, 2)
      ChunkTokens(args(0), litInt(args(1), "chunk_tokens"))
    }),
    fd("repetition_stats", classOf[RepetitionStats], args => {
      nArgs("repetition_stats", args, 2)
      RepetitionStats(args(0), litInt(args(1), "repetition_stats"))
    }),
    fd("sum_token_lengths", classOf[SumTokenLengths], args => {
      nArgs("sum_token_lengths", args, 1)
      SumTokenLengths(args(0))
    }),
    fd("rolling_fingerprint", classOf[RollingFingerprint], args => {
      nArgs("rolling_fingerprint", args, 1)
      RollingFingerprint(args(0))
    }),
    fd("graft_hash", classOf[GraftExtensions], args => {
      // The deterministic sampling/splitting hash (graft.functions.
      // DeterministicHash) for SQL-only users: two CRT limbs, portable
      // int64 arithmetic, h in [0, 2^32). Composed from built-in catalyst
      // arithmetic so it codegens like any expression.
      nArgs("graft_hash", args, 2)
      import org.apache.spark.sql.catalyst.expressions.{Add, Multiply, Remainder}
      import graft.functions.DeterministicHash._
      val id = Cast(args(0), LongType)
      val salt = Cast(args(1), LongType)
      def limb(p: Long, m: Long): Expression =
        Remainder(
          Multiply(Remainder(Add(id, salt), Literal(p)), Literal(m)),
          Literal(modulus))
      BitwiseXor(limb(prime1, multiplier1), limb(prime2, multiplier2))
    }),
    fd("nearest_cells", classOf[NearestCells], args => {
      nArgs("nearest_cells", args, 3)
      // centroid table as a foldable array<array<double>> literal
      val cents = args(1) match {
        case l if l.foldable && l.dataType.isInstanceOf[ArrayType] =>
          val outer = l.eval().asInstanceOf[ArrayData]
          require(outer != null, "nearest_cells: the centroid literal is NULL")
          Array.tabulate(outer.numElements()) { i =>
            val inner = outer.getArray(i)
            require(inner != null, s"nearest_cells: centroid $i is NULL")
            Array.tabulate(inner.numElements()) { j =>
              require(!inner.isNullAt(j), s"nearest_cells: centroid $i has NULL element $j")
              inner.getDouble(j)
            }
          }
        case other => throw new IllegalArgumentException(
          s"nearest_cells: expected a foldable array-of-double-array literal, got $other")
      }
      NearestCells(toDoubleArray(args(0)), cents, litInt(args(2), "nearest_cells"))
    })
  )
}
