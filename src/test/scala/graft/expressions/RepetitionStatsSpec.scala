package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The native single-pass RepetitionStats expression must agree exactly
  * with a composed explode+groupBy reference formulation (which is what
  * the q67 DuckDB oracle mirrors) — on real table text and on generated
  * edge cases. */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference multiset stats via non-distinct grams + driver fold. */
  private def reference(text: String, n: Int): (Long, Long, Long) = {
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val words = if (toks.length == 1 && toks(0).isEmpty) Array.empty[String] else toks
    if (words.length < n) return (0L, 0L, 0L)
    val grams = words.sliding(n).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).map { case (_, g) => g.length.toLong }
    (grams.length.toLong, counts.max, counts.filter(_ > 1).sum)
  }

  private def native(texts: Seq[String], n: Int) =
    texts.toDF("text")
      .select(TextFunctions.repetitionStats(col("text"), n).as("s"))
      .select(col("s.n_grams"), col("s.top_count"), col("s.dup_grams"))
      .as[(Long, Long, Long)].collect().toSeq

  test("edge cases: empty, short, fully-repetitive, mixed whitespace") {
    val cases = Seq(
      "", " ", "a", "a b", "a a", "a a a a a a",
      "one two one two one two",
      "x y z entirely distinct gram stream here",
      "  leading   runs\tand\ntabs  ",
      "UPPER upper UpPeR case case")
    for (n <- Seq(2, 3)) {
      val got = native(cases, n)
      cases.zip(got).foreach { case (text, g) =>
        assert(g == reference(text, n), s"n=$n text='$text'")
      }
    }
  }

  test("property: random token streams agree with the reference fold (100 samples)") {
    val word = Gen.oneOf("the", "fox", "a", "b", "the fox") // multi-word injects collisions
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val samples = Iterator.continually(textGen.sample).flatten.take(100).toSeq
    val got = native(samples, 2)
    samples.zip(got).foreach { case (text, g) =>
      assert(g == reference(text, 2), s"text='$text'")
    }
  }

  test("native == table scan on real documents, and the q67 gate is non-trivial") {
    val docs = graft.Tables.documents(spark, sf0001).limit(200)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val got = native(docs.map(_._2).toSeq, 3)
    docs.map(_._2).zip(got).foreach { case (text, g) =>
      assert(g == reference(text, 3))
    }
    // the synthetic corpus (small vocab, long docs) must actually trip
    // the repetition gate somewhere — a gate nothing ever crosses tests
    // nothing
    val gated = graft.SparkEntry.queries("q67_repetition_quality")(spark, sf0001)
      .where(col("repetitive")).count()
    assert(gated > 0, "q67 gate never fires on the corpus")
  }
}
