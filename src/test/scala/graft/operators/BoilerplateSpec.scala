package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q76 boilerplate-ngram semantics on a corpus where every doc-frequency
  * is constructed: 200 template docs sharing two corpus-frequent shingles
  * plus per-doc-unique tails, one all-template doc, one shingle-less doc.
  * With n = 202 the relative threshold ceil(0.01 * 202) = 3 sits strictly
  * between the unique (df = 1) and template (df = 201) frequencies, so
  * the expected counts are exact and FP-threshold-edge-free. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "boilerplate").toString
    val template = (0 until 200).map { i =>
      (i.toLong, "en", s"common template boilerplate line uniq${i}a uniq${i}b uniq${i}c", 0L)
    }
    val allTemplate = Seq((200L, "en", "common template boilerplate line", 0L))
    val shingleless = Seq((201L, "en", "two tokens", 0L))
    (template ++ allTemplate ++ shingleless)
      .toDF("doc_id", "lang", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q76: per-doc boilerplate counts and fraction are exact on the constructed corpus") {
    val rows = graft.SparkEntry.queries("q76_boilerplate_ngrams")(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(rows.length == 202, "one row per doc, including the shingle-less one")
    val m = rows.map(r => r._1 -> r).toMap
    (0L until 200L).foreach { id =>
      // 5 shingles; [common template boilerplate] and [template boilerplate
      // line] are corpus-frequent (df 201 >= 3), the 3 unique-tail ones
      // are not (df 1 < 3)
      assert(m(id) == ((id, 5L, 2L, Some(0.4))), s"template doc wrong: ${m(id)}")
    }
    assert(m(200L) == ((200L, 2L, 2L, Some(1.0))), s"all-template doc wrong: ${m(200L)}")
    assert(m(201L) == ((201L, 0L, 0L, None)), s"shingle-less doc wrong: ${m(201L)}")
  }

  test("q76: fraction is bounded and NULL exactly for shingle-less docs at sf0.001") {
    val rows = graft.SparkEntry.queries("q76_boilerplate_ngrams")(spark, sf0001)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(rows.length == graft.Tables.documents(spark, sf0001).count())
    rows.foreach { case (id, nSh, nBp, frac) =>
      assert(nBp <= nSh, s"doc $id boilerplate count exceeds shingle count")
      assert(frac.isEmpty == (nSh == 0L), s"doc $id NULL-fraction contract: $nSh -> $frac")
      frac.foreach(f => assert(f >= 0.0 && f <= 1.0, s"doc $id frac $f out of range"))
    }
  }

  test("q193 novelty: every shingle is novel exactly once; q76 shingle counts agree") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q193_ngram_novelty")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // conservation: summed novel counts == the corpus's distinct shingles
    val distinctShingles = graft.Tables.documents(spark, sf0001)
      .select(explode(graft.functions.TextFunctions
        .shinglesOfText(col("text"), 3)).as("sh"))
      .select("sh").distinct().count()
    assert(rows.map(_._3).sum == distinctShingles)
    // the earliest doc with shingles introduces all of them
    val first = rows.filter(_._2 > 0).minBy(_._1)
    assert(first._3 == first._2 && first._4.contains(1.0))
    rows.foreach { case (id, n, novel, frac) =>
      assert(novel <= n, s"doc $id novel > total")
      assert(frac.forall(f => f >= 0.0 && f <= 1.0))
      assert((n == 0L) == frac.isEmpty, "NULL exactly for shingle-less docs")
    }
    // per-doc distinct shingle counts agree with q76's column
    val q76 = graft.SparkEntry.queries("q76_boilerplate_ngrams")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, n, _, _) =>
      assert(q76(id) == n, s"doc $id shingle count disagrees with q76") }
  }
}
