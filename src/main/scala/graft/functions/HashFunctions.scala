package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch column builders for scalable dedup: MinHash signatures
  * (with LSH banding) and 64-bit SimHash. Engine-specific (xxhash64), so
  * these operators carry rows-only driver checks; their *semantics* are
  * covered by ScalaTest properties and by the oracle-verified exact/
  * jaccard dedup queries they approximate.
  */
object HashFunctions {

  private def bridge = org.apache.spark.sql.graftbridge.ColumnBridge

  /** MinHash signature: element i is min over shingles of
    * xxhash64(i, shingle). Native single-pass expression (see
    * expressions.MinHashSignature); bit-identical to the composed form
    * below, property-tested in SketchesSpec. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    bridge.column(graft.expressions.MinHashSignature(bridge.expression(shingleCol), numHashes))

  /** Composed-builtin minhash — the reference semantics the native
    * expression is tested against. */
  def minhashSignatureComposed(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band hashes from a signature: `numBands` values, band b hashing
    * signature rows [b*rowsPerBand, (b+1)*rowsPerBand). Documents sharing
    * any band hash are candidate near-duplicates. */
  def bandHashes(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(
          lit(b) +: (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
          .as("bucket"))
    }: _*)

  /** 64-bit SimHash over a token array: per bit j, sum +-1 weighted by
    * whether bit j of xxhash64(token) is set; result bit j = (sum > 0).
    * Hamming-close simhashes <=> similar token multisets. Native
    * single-pass expression; bit-identical to the composed form below. */
  def simhash64(toks: Column): Column =
    bridge.column(graft.expressions.SimHash64(bridge.expression(toks)))

  /** Composed-builtin simhash — reference semantics for SketchesSpec. */
  def simhash64Composed(toks: Column): Column = {
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(sequence(lit(0), lit(63)),
            j => when(call_function("shiftright", xxhash64(t), j).bitwiseAND(1) === 1, 1)
              .otherwise(-1)),
          (a, b) => a + b))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)), (c, j) => struct(c.as("c"), j.as("j"))),
      lit(0L),
      (acc, x) => acc + when(x.getField("c") > 0,
        call_function("shiftleft", lit(1L), x.getField("j"))).otherwise(0L))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
