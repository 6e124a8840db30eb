package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-content edge cases the oracle parity contract must not depend
  * on (ADVICE r3): documents with zero whitespace tokens must yield NULL
  * ratios — not Spark-NULL-vs-DuckDB-Infinity divergence. */
class TextEdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "text-edge").toString
    // doc 0: normal; doc 1: whitespace-only (0 tokens); doc 2: empty text
    Seq(
      (0L, "en", "the quick brown fox", 19L),
      (1L, "en", "   \t  \n ", 8L),
      (2L, "en", "", 0L))
      .toDF("doc_id", "lang", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q63 fertility is NULL (not Infinity/NaN) for token-less documents") {
    val byId = graft.SparkEntry.queries("q63_bpe_token_count")(spark, edgeDir)
      .select("doc_id", "n_ws_tokens", "fertility")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(0L)._1 == 4 && byId(0L)._2.isDefined)
    Seq(1L, 2L).foreach { id =>
      assert(byId(id)._1 == 0, s"doc $id should have 0 tokens")
      assert(byId(id)._2.isEmpty, s"doc $id fertility should be NULL, got ${byId(id)._2}")
    }
  }

  test("q29 ratios are NULL and total_len is 0 for token-less documents") {
    val byId = graft.SparkEntry.queries("q29_text_token_stats")(spark, edgeDir)
      .select("doc_id", "n_tokens", "total_len", "avg_token_len", "ttr")
      .as[(Long, Long, Option[Long], Option[Double], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(byId(0L)._1 == 4 && byId(0L)._2.contains(16L) &&
      byId(0L)._3.contains(4.0) && byId(0L)._4.contains(1.0))
    Seq(1L, 2L).foreach { id =>
      assert(byId(id)._1 == 0)
      // total_len must be 0, not NULL: the native SumTokenLengths returns
      // 0 for an empty array while DuckDB's list_sum returns NULL — the
      // oracle COALESCEs to match this defined zero
      assert(byId(id)._2.contains(0L),
        s"doc $id total_len should be 0, got ${byId(id)._2}")
      assert(byId(id)._3.isEmpty && byId(id)._4.isEmpty,
        s"doc $id ratios should be NULL, got ${byId(id)}")
    }
  }

  test("the guards agree with DuckDB semantics on the edge corpus shape") {
    // No Infinity/NaN anywhere in the outputs — the exact property the
    // oracle hash compare needs (DuckDB would emit inf for x/0 without
    // the CASE guard; both engines emit NULL with it).
    Seq("q63_bpe_token_count", "q29_text_token_stats").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, edgeDir)
      val doubles = df.schema.fields.filter(_.dataType.typeName == "double").map(_.name)
      doubles.foreach { c =>
        val bad = df.where(isnan(col(c)) || col(c) === Double.PositiveInfinity ||
          col(c) === Double.NegativeInfinity).count()
        assert(bad == 0, s"$q.$c produced NaN/Infinity on the edge corpus")
      }
    }
  }
}
