package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Anchors for the classifier-evaluation rows: q197's confusion matrix
  * must reconcile cell-for-cell with q31's per-document predictions,
  * and q198's AUC must equal a brute-force rank fold over the
  * collected documents. */
class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

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

  test("q205: per-query metrics equal a brute-force shingle retrieval") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(text: String): Set[String] = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set.empty
    }
    val sh = docs.map { case (id, src, t) => (id, src, shingles(t)) }
    val metrics = sh.filter(_._1 % 20 == 0).flatMap { case (q, qsrc, qs) =>
      val cands = sh.filter(c => c._1 != q && (c._3 & qs).nonEmpty)
        .map(c => (c._1, c._2, (c._3 & qs).size.toLong))
      if (cands.isEmpty) None else {
        val ranked = cands.sortBy(c => (-c._3, c._1)).zipWithIndex
          .map { case ((cid, csrc, s), i) => (cid, csrc, s, i + 1L) }
        val relRanks = ranked.filter(_._2 == qsrc).map(_._4)
        val first = if (relRanks.isEmpty) 0L else relRanks.min
        Some((q, (ranked.length.toLong, relRanks.length.toLong,
          relRanks.count(_ <= 10L).toLong, first,
          if (first > 0) 1.0 / first.toDouble else 0.0)))
      }
    }.toMap
    val got = SparkEntry.queries("q205_retrieval_eval")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(got == metrics, s"got=${got.toSeq.sortBy(_._1).take(5)} " +
      s"want=${metrics.toSeq.sortBy(_._1).take(5)}")
  }

  test("q206: calibration bins equal brute force; Brier mass is conserved") {
    val en = Set("the", "and", "of", "to", "a")
    val docs = graft.Tables.documents(spark, sf0001)
      .select("lang", "text").collect()
      .map(r => (r.getString(0) == "en",
        math.min(r.getString(1).trim.toLowerCase.split("\\s+")
          .count(en), 10L)))
    val want = docs.groupBy(_._2).map { case (s, xs) =>
      val n = xs.length.toLong; val np = xs.count(_._1).toLong
      s -> (n, np, s.toDouble / 10.0, np.toDouble / n.toDouble,
        np * (10 - s) * (10 - s) + (n - np) * s * s,
        math.abs(10 * np - s * n))
    }
    val got = SparkEntry.queries("q206_calibration_bins")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got == want, s"got=$got want=$want")
    // every document lands in exactly one bin
    assert(got.values.map(_._1).sum == docs.length.toLong)
  }

  test("q265 nDCG: bounded, consistent with q205, exact on perfect prefixes") {
    val ndcg = graft.SparkEntry.queries("q265_ndcg_at_10")(spark, sf0001)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    val q205 = graft.SparkEntry.queries("q205_retrieval_eval")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(ndcg.nonEmpty)
    val dLit = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
      356207L, 333333L, 315465L, 301030L, 289065L)
    ndcg.foreach { case (q, nRel, dcg, idcg, v) =>
      // same query set and relevant counts as q205
      assert(q205.contains(q) && q205(q)._3 == nRel, s"q$q mismatch")
      assert(dcg >= 0L && dcg <= idcg, s"q$q: dcg $dcg > idcg $idcg")
      assert(v >= 0.0 && v <= 1.0)
      if (nRel > 0) assert(v == dcg.toDouble / idcg.toDouble)
      // a query whose first min(nRel,10) ranks are all relevant is a
      // perfect prefix: integer dcg == integer idcg -> ndcg EXACTLY 1
      val k = math.min(nRel, 10L).toInt
      if (nRel > 0 && dcg == dLit.take(k).sum) assert(v == 1.0)
      // and hits@10 == 0 forces dcg == 0
      if (q205(q)._4 == 0L) assert(dcg == 0L, s"q$q: dcg without hits")
    }
    // the corpus has at least one imperfect ranking (otherwise the
    // metric is vacuous here) and at least one positive one
    assert(ndcg.exists(r => r._5 > 0.0 && r._5 < 1.0) ||
      ndcg.count(_._5 == 1.0) < ndcg.size)
    assert(ndcg.exists(_._5 > 0.0))
  }
}
