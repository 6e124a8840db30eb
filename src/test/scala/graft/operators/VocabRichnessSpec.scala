package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q241 semantic anchors: the per-source richness row refolds exactly
  * from the query's own token stream, and planted extremes prove the
  * estimator algebra — an all-hapax source (every token unique) gives
  * p_unseen = 1 and the bias-corrected Chao1, an all-doubleton source
  * gives p_unseen = 0 and chao1 = vocab exactly. */
class VocabRichnessSpec extends SparkSpec {
  import spark.implicits._

  test("q241: rows refold exactly from the token stream") {
    val toks = graft.Tables.documents(spark, sf0001)
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("term"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expect = toks.groupBy(_._1).view.mapValues { ts =>
      val byTerm = ts.groupBy(_._2).view.mapValues(_.length).toMap
      val n = ts.length.toLong
      val v = byTerm.size.toLong
      val n1 = byTerm.count(_._2 == 1).toLong
      val n2 = byTerm.count(_._2 == 2).toLong
      (n, v, n1, n2)
    }.toMap

    val rows = SparkEntry.queries("q241_vocab_richness")(spark, sf0001)
      .collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, v, n1, n2) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_tok") == n)
      assert(r.getAs[Long]("vocab") == v)
      assert(r.getAs[Long]("n1") == n1)
      assert(r.getAs[Long]("n2") == n2)
      assert(r.getAs[Double]("p_unseen") == n1.toDouble / n.toDouble)
      val chao1 = if (n2 > 0) v.toDouble + (n1 * n1).toDouble / (2 * n2)
        else v.toDouble + (n1 * (n1 - 1)).toDouble / 2.0
      assert(r.getAs[Double]("chao1") == chao1)
    }
  }

  test("q241: planted extremes — all-hapax and all-doubleton sources") {
    val docs = Seq(
      ("hapax", (1 to 12).map(i => s"u$i").mkString(" ")),
      ("doubled", ((1 to 6) ++ (1 to 6)).map(i => s"d$i").mkString(" "))
    ).toDF("source", "text")
    val rows = TextQueries.vocabRichness(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val h = rows("hapax")
    assert(h.getAs[Long]("n1") == 12L && h.getAs[Long]("n2") == 0L)
    assert(h.getAs[Double]("p_unseen") == 1.0)
    assert(h.getAs[Double]("chao1") == 12.0 + 12.0 * 11.0 / 2.0)
    val d = rows("doubled")
    assert(d.getAs[Long]("n1") == 0L && d.getAs[Long]("n2") == 6L)
    assert(d.getAs[Double]("p_unseen") == 0.0)
    assert(d.getAs[Double]("chao1") == 6.0)
  }
}
