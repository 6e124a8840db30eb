package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native single-pass sketch expressions for the dedup operators —
  * bit-identical to the composed higher-order-function formulations they
  * replace (same xxhash64 chaining as Spark's `xxhash64(lit(i), s)` /
  * `xxhash64(s)`: seed 42, int then string), but one virtual call per row
  * instead of k interpreted lambda passes. Both participate in
  * whole-stage codegen via a static helper call.
  */

/** MinHash signature: element i = min over the (pre-distinct) shingle
  * array of xxhash64(i, shingle). Empty input -> array of k nulls,
  * matching `array_min(transform(empty, ...))` = null per element; null
  * ELEMENTS hash like xxhash64's null-skipping. Known divergence from
  * the composed form: a NULL input ARRAY yields NULL here (standard
  * unary null propagation) where the composed form yields an array of k
  * nulls — upstream shingling never produces a null array for non-null
  * text. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashSignature.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  // seeds depend only on k: memoize instead of recomputing per row
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seedsFor(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, kk => Array.tabulate(kk)(i => XXH64.hashInt(i, 42L)))

  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    // per-hash-function chained seed, exactly xxhash64(lit(i), s)
    val seeds = seedsFor(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      var i = 0
      while (i < k) {
        // a null element hashes to the int-only prefix, exactly like
        // xxhash64(lit(i), NULL) which skips null children
        val h = if (s == null) seeds(i) else XXH64.hashUTF8String(s, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf): Array[Any])
  }
}

/** 64-bit SimHash over a token array: bit j of the result is set when the
  * +-1 vote sum of bit j across xxhash64(token) values is positive. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      // null token -> bare seed, matching xxhash64(NULL) = 42
      val h = if (s == null) 42L else XXH64.hashUTF8String(s, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) res |= (1L << b); b += 1 }
    res
  }
}
