package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Anchors for the classifier-evaluation rows: q197's confusion matrix
  * must reconcile cell-for-cell with q31's per-document predictions,
  * and q198's AUC must equal a brute-force rank fold over the
  * collected documents. */
class EvalMetricsSpec extends SparkSpec {

  test("q197 confusion: cells == q31's per-doc predictions; rows conserve") {
    val preds = SparkEntry.queries("q31_text_langid")(spark, sf0001)
      .select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = preds.groupBy(identity).map { case ((t, p), xs) =>
      (t, p, xs.length.toLong) }.toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q197_langid_confusion")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == want)
    assert(got.map(_._3).sum == preds.length.toLong, "cells conserve docs")
    got.groupBy(_._1).foreach { case (t, rows) =>
      assert(rows.map(_._3).sum == rows.head._4,
        s"row_total of $t != its cell sum")
      rows.foreach(r => assert(r._5 == r._3.toDouble / r._4.toDouble))
    }
  }

  test("q198 AUC: equals the brute-force tie-aware rank statistic") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select((col("lang") === "en").as("en"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("v"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val pos = docs.filter(_._1).map(_._2)
    val neg = docs.filterNot(_._1).map(_._2)
    // O(n1*n0) literal definition: wins + half-ties
    val u1x2 = pos.iterator.map { p =>
      neg.count(_ < p).toLong * 2L + neg.count(_ == p).toLong
    }.sum
    val auc = u1x2.toDouble / (2L * pos.length * neg.length).toDouble
    val r = SparkEntry.queries("q198_feature_auc")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("n1") == pos.length.toLong)
    assert(r.getAs[Long]("n0") == neg.length.toLong)
    assert(r.getAs[Long]("u1_x2") == u1x2, s"${r.getAs[Long]("u1_x2")} != $u1x2")
    assert(r.getAs[Double]("auc")
      == u1x2.toDouble / (2L * pos.length * neg.length).toDouble)
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
