package graft.expressions

import graft.SparkSpec
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.functions._

/** Native MinHashSignature / SimHash64 must be bit-identical to the
  * composed higher-order-function formulations on real table text. */
class SketchesSpec extends SparkSpec {

  // null-safe comparison: `not(a === b)` null-propagates and would pass
  // vacuously if one side were NULL — <=> treats NULL = NULL as equal
  // and NULL = value as a detectable mismatch.
  test("native minhash == composed minhash on the documents table") {
    val sh = graft.Tables.documents(spark, sf0001)
      .select(TextFunctions.shinglesOfText(col("text"), 3).as("sh"))
    val d = sh.select(
      HashFunctions.minhashSignature(col("sh"), 16).as("fast"),
      HashFunctions.minhashSignatureComposed(col("sh"), 16).as("slow"))
    assert(d.where(not(col("fast") <=> col("slow"))).count() == 0)
  }

  test("native simhash == composed simhash on the documents table") {
    val toks = graft.Tables.documents(spark, sf0001)
      .select(TextFunctions.tokens(col("text")).as("w"))
    val d = toks.select(
      HashFunctions.simhash64(col("w")).as("fast"),
      HashFunctions.simhash64Composed(col("w")).as("slow"))
    assert(d.where(not(col("fast") <=> col("slow"))).count() == 0)
  }

  test("null array elements: native matches composed (xxhash64 null-skip)") {
    import spark.implicits._
    val df = Seq(Seq[String]("a", null, "b"), Seq[String](null)).toDF("arr")
    val d = df.select(
      HashFunctions.minhashSignature(col("arr"), 4).as("mf"),
      HashFunctions.minhashSignatureComposed(col("arr"), 4).as("ms"),
      HashFunctions.simhash64(col("arr")).as("sf"),
      HashFunctions.simhash64Composed(col("arr")).as("ss"))
    assert(d.where(not(col("mf") <=> col("ms")) || not(col("sf") <=> col("ss"))).count() == 0)
  }

  test("edge cases: empty and single-token arrays") {
    import spark.implicits._
    val df = Seq("", "one", "one two three four").toDF("text")
      .select(TextFunctions.shinglesOfText(col("text"), 3).as("sh"),
        TextFunctions.tokens(col("text")).as("w"))
    val d = df.select(
      HashFunctions.minhashSignature(col("sh"), 4).as("f"),
      HashFunctions.minhashSignatureComposed(col("sh"), 4).as("s"),
      HashFunctions.simhash64(col("w")).as("fh"),
      HashFunctions.simhash64Composed(col("w")).as("sh2"))
    d.collect().foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }
}
