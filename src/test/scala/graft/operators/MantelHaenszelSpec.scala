package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q242 semantic anchors: the per-stratum cells refold exactly from
  * the query's own label frame, and a planted Simpson's-paradox
  * instance proves the pooling — two strata each with odds ratio
  * exactly 1 whose CRUDE (collapsed) table shows OR 1.5; the MH
  * estimator must return exactly 1.0. */
class MantelHaenszelSpec extends SparkSpec {
  import spark.implicits._

  test("q242: cells and scaled terms refold exactly from the label frame") {
    val lab = graft.Tables.documents(spark, sf0001)
      .select(col("lang"),
        (size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long") >= 70L).as("e"),
        (col("n_chars").cast("long") >= 385L).as("o"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val cells = lab.groupBy(_._1).view.mapValues { xs =>
      val a = xs.count(x => x._2 && x._3).toLong
      val b = xs.count(x => x._2 && !x._3).toLong
      val c = xs.count(x => !x._2 && x._3).toLong
      val d = xs.count(x => !x._2 && !x._3).toLong
      (a, b, c, d, xs.length.toLong)
    }.toMap
    val sumAd = cells.values.map { case (a, _, _, d, n) =>
      a * d * 1000000000L / n }.sum
    val sumBc = cells.values.map { case (_, b, c, _, n) =>
      b * c * 1000000000L / n }.sum

    val rows = SparkEntry.queries("q242_mantel_haenszel")(spark, sf0001)
      .collect()
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val (a, b, c, d, n) = cells(r.getAs[String]("lang"))
      assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
        r.getAs[Long]("d"), r.getAs[Long]("n")) == ((a, b, c, d, n)))
      assert(r.getAs[Long]("ad_term") == a * d * 1000000000L / n)
      assert(r.getAs[Long]("bc_term") == b * c * 1000000000L / n)
      assert(r.getAs[Long]("sum_ad") == sumAd)
      assert(r.getAs[Long]("sum_bc") == sumBc)
      assert(r.getAs[Double]("or_mh")
        == (if (sumBc > 0) sumAd.toDouble / sumBc.toDouble else 0.0))
    }
    // exposure (tokens >= 70) and outcome (chars >= 385) are strongly
    // associated on the real corpus regardless of the lang stratum
    assert(rows.head.getAs[Double]("or_mh") > 10.0)
  }

  test("q242: planted Simpson's paradox — stratum ORs 1, crude OR 1.5, MH exactly 1") {
    // stratum s1: a=80 b=80 c=20 d=20 (OR 1); s2: a=10 b=40 c=10 d=40
    // (OR 1). Collapsed: (90*60)/(120*30) = 1.5. MH terms: 8+4 vs 8+4.
    def mk(lang: String, e: Boolean, o: Boolean, k: Int) = {
      val text = (1 to (if (e) 70 else 10)).map(i => s"w$i").mkString(" ")
      Seq.fill(k)((lang, if (o) 400L else 100L, text))
    }
    val docs = (mk("s1", true, true, 80) ++ mk("s1", true, false, 80)
      ++ mk("s1", false, true, 20) ++ mk("s1", false, false, 20)
      ++ mk("s2", true, true, 10) ++ mk("s2", true, false, 40)
      ++ mk("s2", false, true, 10) ++ mk("s2", false, false, 40))
      .toDF("lang", "n_chars", "text")
    val rows = AgreementQueries.mantelHaenszel(docs).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("or_mh") == 1.0,
        s"MH must cancel the confounding exactly: $r")
    }
    // and the crude (collapsed) table really is confounded
    val crude = AgreementQueries.mantelHaenszel(
      docs.withColumn("lang", lit("all"))).collect().head
    assert(crude.getAs[Double]("or_mh") == 1.5)
  }
}
