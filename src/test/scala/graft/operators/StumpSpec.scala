package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q230 semantic anchor: the elected stump equals an O(|domain|)
  * driver-side sweep over every threshold and orientation, and the
  * election is genuinely optimal (no candidate beats the reported
  * error). The real corpus draws lang tags independently of text —
  * measured, so gain 0 is the CORRECT real-corpus answer — and the
  * finder's discriminating power is proven on a constructed separable
  * frame with a known threshold and one planted noise point. */
class StumpSpec extends SparkSpec {

  test("q230: elected stumps equal the exhaustive sweep; optimality holds") {
    val en = graft.functions.TextFunctions.langVocab.toMap.apply("en")
    val pts = graft.Tables.documents(spark, sf0001)
      .select(graft.functions.TextFunctions
          .vocabHits(graft.functions.TextFunctions.tokens(col("text")), en)
          .cast("long").as("h"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Long]("y")))
    val n = pts.length.toLong
    val p = pts.map(_._2).sum
    val dom = pts.groupBy(_._1).toSeq.sortBy(_._1)
    var cn = 0L; var cp = 0L
    val sweep = dom.flatMap { case (h, g) =>
      cn += g.length; cp += g.map(_._2).sum
      Seq(("le_pos", h, (cn - cp) + (p - cp)),
        ("le_neg", h, cp + ((n - cn) - (p - cp))))
    }
    def bestFor(o: String): (Long, Long) = {
      val cand = sweep.filter(_._1 == o)
      val e = cand.map(_._3).min
      (cand.filter(_._3 == e).map(_._2).min, e) // (threshold, err)
    }

    val rows = SparkEntry.queries("q230_decision_stump")(spark, sf0001)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val o = r.getAs[String]("orientation")
      val (thr, err) = bestFor(o)
      assert(r.getAs[Long]("threshold_hits") == thr, s"$o threshold")
      assert(r.getAs[Long]("err") == err, s"$o err")
      assert(r.getAs[Long]("baseline_err") == math.min(p, n - p))
      assert(r.getAs[Long]("gain") == math.min(p, n - p) - err)
      // optimality: no candidate of this orientation beats it
      assert(sweep.filter(_._1 == o).forall(_._3 >= err))
      assert(r.getAs[Long]("n_docs") == n)
    }
    // the real corpus is label-independent BY CONSTRUCTION (measured:
    // lang tags are drawn independently of text) — the correct answer
    // is "no useful split": any gain is overfit noise, bounded well
    // under the ~19% a real separator would show (if this fires, the
    // corpus was regenerated with text-correlated lang tags — update
    // the q230 note)
    val base = rows.head.getAs[Long]("baseline_err").toDouble
    rows.foreach(r => assert(r.getAs[Long]("gain") <= 0.05 * base,
      s"gain ${r.getAs[Long]("gain")} vs baseline $base"))
  }

  test("q230: constructed separable frame — known threshold, planted noise") {
    import spark.implicits._
    // docs with k english stopwords; en iff k >= 5, one flipped row
    val docs = ((0 until 20).map { i =>
      val k = i % 10
      val lang = if ((k >= 5) != (i == 13)) "en" else "de"
      (lang, (Seq.fill(k)("the") ++ Seq.fill(10 - k)("xyz")).mkString(" "))
    }).toDF("lang", "text")
    val rows = ExtendedQueries.decisionStump(docs).collect()
    val best = rows.minBy(_.getAs[Long]("err"))
    // le_pos (x <= t predicts en) can never beat le_neg here; the
    // winner predicts en above the threshold with ONE error (the
    // planted flip at i=13, k=3, labeled en)
    assert(best.getAs[String]("orientation") == "le_neg")
    assert(best.getAs[Long]("threshold_hits") == 4L,
      s"threshold: $best")
    assert(best.getAs[Long]("err") == 1L)
    assert(best.getAs[Long]("gain") > 0L, "separable frame must gain")
  }
}
