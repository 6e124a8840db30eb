package graft.operators

import graft.SparkSpec
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.functions._

/** Semantics of the dedup sketches (minhash / LSH / simhash) that the
  * driver can only rows-check: identity, sensitivity and recall against
  * exact Jaccard (q34 is the oracle-verified ground truth). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again today"
  private val docB = "the quick brown fox jumps over the lazy dog again and again tomorrow"
  private val docC = "completely different content about spark query engines and shuffles here"

  private def shingleDf = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    .select(col("doc_id"), TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))

  test("identical shingle sets -> identical minhash signatures; jaccard 1.0") {
    val df = Seq((1L, docA), (2L, docA)).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .select(col("doc_id"), HashFunctions.minhashSignature(col("sh"), 16).as("sig"))
    val sigs = df.orderBy("doc_id").select("sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 16)
  }

  test("near-identical docs collide in at least one LSH band; unrelated do not") {
    val sig = shingleDf.select(col("doc_id"),
      HashFunctions.minhashSignature(col("sh"), 16).as("sig"))
    val bands = sig.select(col("doc_id"),
        explode(HashFunctions.bandHashes(col("sig"), 8, 2)).as("bh"))
      .select(col("doc_id"), col("bh.band"), col("bh.bucket"))
    val cand = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)), s"near-dup pair not in candidates: $cand")
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)),
      s"unrelated doc collided in all-band check: $cand")
  }

  test("minhash signature agreement estimates jaccard") {
    val sig = shingleDf.select(col("doc_id"),
      HashFunctions.minhashSignature(col("sh"), 64).as("sig"))
    val rows = sig.orderBy("doc_id").select("sig").as[Seq[Long]].collect()
    val agree = rows(0).zip(rows(1)).count { case (a, b) => a == b } / 64.0
    val jac = shingleDf.alias("a").join(shingleDf.alias("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(TextFunctions.jaccard(col("a.sh"), col("b.sh"))).as[Double].head()
    assert(math.abs(agree - jac) < 0.25, s"minhash est $agree vs true $jac")
  }

  test("simhash: identical tokens -> distance 0; small edit -> small distance; unrelated -> large") {
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
      .select(col("doc_id"), HashFunctions.simhash64(TextFunctions.tokens(col("text"))).as("sh"))
    val m = df.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(m(a) ^ m(b))
    assert(ham(1, 1) == 0)
    assert(ham(1, 2) < 16, s"near-dup hamming ${ham(1, 2)}")
    assert(ham(1, 3) > ham(1, 2), s"unrelated ${ham(1, 3)} !> near ${ham(1, 2)}")
  }

  test("LSH candidates recover every exact-jaccard pair >= 0.5 at sf0.001") {
    val exact = SparkEntry_q34(sf0001).where(col("jac") >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = graft.SparkEntry.queries("q35_dedup_minhash_lsh")(spark, sf0001)
      .where(col("doc_a") < 300 && col("doc_b") < 300)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test needs at least one strong near-dup pair in the slice")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
  }

  private def SparkEntry_q34(d: String) =
    graft.SparkEntry.queries("q34_dedup_jaccard_pairs")(spark, d)
}
