package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** ChunkTokens invariants: chunks rejoin to exactly the token stream,
  * every chunk is full except possibly the last, and the q69 packing
  * offsets are globally contiguous (the distributed prefix sum computes
  * the same layout a single sequential pass would). */
class ChunkTokensSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(texts: Seq[String], k: Int): Seq[Seq[String]] =
    texts.toDF("text")
      .select(TextFunctions.chunkTokens(col("text"), k).as("c"))
      .as[Seq[String]].collect().toSeq

  test("chunks rejoin to the token stream; all full but the last") {
    val cases = Seq("", " ", "a", "a b c", "one two three four five six seven",
      "  spaced   out\ttokens\nhere  ", "UPPER Case")
    for (k <- Seq(1, 2, 3, 32)) {
      cases.zip(chunksOf(cases, k)).foreach { case (text, chunks) =>
        val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty).toSeq
        assert(chunks.flatMap(_.split(" ").filter(_.nonEmpty)) == toks,
          s"k=$k text='$text'")
        if (chunks.nonEmpty) {
          assert(chunks.init.forall(_.split(" ").length == k), s"k=$k '$text'")
          assert(chunks.last.split(" ").count(_.nonEmpty) <= k)
        }
      }
    }
  }

  test("property: random streams chunk losslessly (100 samples)") {
    val word = Gen.oneOf("alpha", "b", "cc", "d9")
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val samples = Iterator.continually(textGen.sample).flatten.take(100).toSeq
    samples.zip(chunksOf(samples, 3)).foreach { case (text, chunks) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      assert(chunks.flatMap(_.split(" ").filter(_.nonEmpty)) == toks)
    }
  }

  test("q69 packing offsets are globally contiguous (prefix sum == sequential layout)") {
    val rows = graft.SparkEntry.queries("q69_sequence_packing")(spark, sf0001)
      .select("doc_id", "n_tokens", "start_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(rows.nonEmpty && rows.head._3 == 0L)
    rows.sliding(2).foreach {
      case Array((_, n, s), (_, _, s2)) =>
        assert(s2 == s + n, s"gap in packing: $s + $n != $s2")
      case _ =>
    }
    // and the layout follows doc_id order (the documented packing order)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }
}
