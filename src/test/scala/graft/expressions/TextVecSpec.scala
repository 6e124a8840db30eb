package graft.expressions

import graft.SparkSpec
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._

/** The native text/vector expressions must be VALUE-IDENTICAL to the
  * composed-HOF formulations they replaced (same fold order, same null
  * semantics) — checked over the real corpus, not toy rows, because that
  * is what the DuckDB oracles hash. */
class TextVecSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sf0001)

  test("native tokens == composed tokens over the whole corpus") {
    val diff = docs.select(
      TF.tokens(col("text")).as("n"), TF.tokensComposed(col("text")).as("c"))
      .where(not(col("n") <=> col("c")))
    assert(diff.count() == 0)
    // whitespace-edge cases
    val edge = Seq("", "   ", " One  TWO\tthree \n", "x").toDF("text")
    val e = edge.select(TF.tokens(col("text")).as("n"), TF.tokensComposed(col("text")).as("c"))
      .where(not(col("n") <=> col("c")))
    assert(e.count() == 0)
  }

  test("native vocabHits / sumTokenLengths / fingerprint == composed forms") {
    val w = TF.tokens(col("text"))
    val vocab = Seq("the", "and", "of", "to", "a")
    val diff = docs.select(
      TF.vocabHits(w, vocab).as("vh_n"), TF.vocabHitsComposed(w, vocab).as("vh_c"),
      TF.sumTokenLengths(w).as("sl_n"),
      aggregate(transform(w, t => length(t).cast("long")), lit(0L), _ + _).as("sl_c"),
      TF.fingerprint(w).as("fp_n"), TF.fingerprintComposed(w).as("fp_c"))
      .where(not(col("vh_n") <=> col("vh_c")) ||
        not(col("sl_n") <=> col("sl_c")) || not(col("fp_n") <=> col("fp_c")))
    assert(diff.count() == 0)
  }

  test("native dot is bit-identical to the composed index-ordered fold") {
    val e = graft.Tables.embeddings(spark, sf0001).limit(200)
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") <= col("ia") + 3)
    val diff = pairs.select(
      VF.dot(col("va"), col("vb")).as("n"),
      VF.dotComposed(col("va"), col("vb")).as("c"))
      .where(not(col("n") <=> col("c"))) // bitwise: <=> on doubles
    assert(diff.count() == 0)
    // norm2 == sqrt of the composed self-product fold
    val nd = e.select(VF.norm2(col("embedding")).as("n"),
      sqrt(VF.dotComposed(col("embedding"), col("embedding"))).as("c"))
      .where(not(col("n") <=> col("c")))
    assert(nd.count() == 0)
  }

  test("vec_dot null semantics match zip_with/aggregate composition") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),      // 11.0
      (Seq(1.0), Seq(1.0, 2.0)),           // length mismatch -> null
      (Seq.empty[Double], Seq.empty[Double]) // 0.0
    ).toDF("a", "b")
    val out = df.select(
      VF.dot(col("a"), col("b")).as("n"),
      VF.dotComposed(col("a"), col("b")).as("c"))
    out.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    // null element poisons to null, like a null-padded zip_with product
    val withNull = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)))
      .toDF("a", "b")
    assert(withNull.select(VF.dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }
}
