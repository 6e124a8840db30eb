package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The native WordShingles expression must agree exactly with the
  * composed higher-order-function formulation (which is what the DuckDB
  * oracle mirrors) — on real table text and on generated edge cases. */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame) = df.select(
    TextFunctions.shinglesOfText(col("text"), 3).as("fast"),
    TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("slow"))

  test("native == composed on the documents table") {
    val d = both(graft.Tables.documents(spark, sf0001))
    assert(d.where(not(col("fast") === col("slow"))).count() == 0)
  }

  test("native == composed on whitespace/edge-case strings") {
    val cases = Seq(
      "", " ", "   ", "a", "a b", "a b c", "a b c d",
      "  leading and trailing  ", "double  space   runs", "UPPER Case MiXeD",
      "a\tb\nc d", "repeat repeat repeat repeat repeat", "one two one two one two")
    val d = both(cases.toDF("text"))
    val bad = d.where(not(col("fast") === col("slow"))).collect()
    assert(bad.isEmpty, s"mismatch: ${bad.mkString(",")}")
  }

  test("property: random token streams agree (100 ScalaCheck samples)") {
    val word = Gen.oneOf("the", "fox", "a", "B", "cc", "d1", "éé")
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val samples = Iterator.continually(textGen.sample).flatten.take(100).toSeq
    val d = both(samples.toDF("text"))
      .withColumn("ok", col("fast") === col("slow"))
    assert(d.where(not(col("ok"))).count() == 0)
  }

  test("shingle counts and distinctness") {
    val out = Seq("a b c d e").toDF("text")
      .select(TextFunctions.shinglesOfText(col("text"), 3)).as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d", "c d e"))
  }
}
