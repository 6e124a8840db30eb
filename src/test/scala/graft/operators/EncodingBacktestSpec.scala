package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.functions.DeterministicHash
import org.apache.spark.sql.functions._

/** Semantic anchors for q218 out-of-fold target encoding and q219
  * Markov next-event backtest — brute-force driver-side recomputation
  * on the real sf0.001 corpus plus the leakage properties the designs
  * exist for (fold-complement encoding, customer-shared folds,
  * no boundary-crossing transitions). */
class EncodingBacktestSpec extends SparkSpec {
  import spark.implicits._

  test("q218: encodings equal the fold-complement brute force; folds are customer-shared") {
    val rows = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def fold(custkey: Long): Long =
      DeterministicHash.knuth32Local(custkey, DeterministicHash.foldSalt) % 5
    val byCat = rows.groupBy(_._1)
    val out = SparkEntry.queries("q218_target_encoding")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    val gN = rows.length.toLong
    val gS = rows.map(_._3).sum
    val gm = gS.toDouble / gN.toDouble
    for (r <- out) {
      val cat = r.getAs[String]("cat")
      val f = r.getAs[Long]("fold")
      val cr = byCat(cat)
      val inFold = cr.filter(x => fold(x._2) == f)
      val nCf = inFold.length.toLong
      val sCf = inFold.map(_._3).sum
      val nC = cr.length.toLong
      val sC = cr.map(_._3).sum
      assert(r.getAs[Long]("n_cf") == nCf, s"$cat/$f n_cf")
      assert(r.getAs[Long]("s_cf") == sCf, s"$cat/$f s_cf")
      assert(r.getAs[Long]("n_oof") == nC - nCf)
      assert(r.getAs[Long]("s_oof") == sC - sCf)
      if (nC - nCf > 0)
        assert(r.getAs[Double]("enc_oof")
          == (sC - sCf).toDouble / (nC - nCf).toDouble, s"$cat/$f enc")
      assert(r.getAs[Double]("enc_smooth")
        == ((sC - sCf).toDouble + 20.0 * gm) / ((nC - nCf).toDouble + 20.0))
    }
    // leakage guard: an in-fold row's cents never moves its own
    // encoding — shifting every fold-f row by a constant leaves
    // enc_oof for (cat, f) unchanged (complement algebra)
    val cat0 = out.head.getAs[String]("cat")
    val f0 = out.head.getAs[Long]("fold")
    val shifted = rows.map { case (c, k, v) =>
      if (c == cat0 && fold(k) == f0) (c, k, v + 1000000L) else (c, k, v) }
    val cr = shifted.filter(_._1 == cat0)
    val oofAfter = {
      val inF = cr.filter(x => fold(x._2) == f0)
      val n = (cr.length - inF.length).toLong
      (cr.map(_._3).sum - inF.map(_._3).sum).toDouble / n.toDouble
    }
    assert(oofAfter == out.head.getAs[Double]("enc_oof"),
      "in-fold label shift leaked into the fold's own encoding")
  }

  test("q219: accuracy equals brute force; no transition crosses the time boundary") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).getTime * 1000L, r.getLong(2), r.getString(3)))
    val days = ev.map(_._2 / 86400000000L)
    val (mn, mx) = (days.min, days.max)
    val split = mn + ((mx - mn + 1) * 4) / 5
    def seg(tsUs: Long): Long = if (tsUs / 86400000000L < split) 0 else 1
    def pairs(s: Long) = ev.filter(e => seg(e._2) == s)
      .groupBy(_._1).toSeq.flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        sorted.zip(sorted.drop(1)).map { case (a, b) => (a._4, b._4) }
      }
    val tr = pairs(0).groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val te = pairs(1).groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val predOf = tr.groupBy(_._1._1).map { case (p, m) =>
      p -> m.toSeq.map { case ((_, nx), n) => (nx, n) }
        .sortBy { case (nx, n) => (-n, nx) }.head._1 }
    val rows = SparkEntry.queries("q219_markov_backtest")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val p = r.getAs[String]("prev_type")
      val nTest = te.collect { case ((pp, _), n) if pp == p => n }.sum
      assert(r.getAs[Long]("n_test") == nTest, s"$p n_test")
      predOf.get(p) match {
        case Some(pr) =>
          assert(r.getAs[String]("predicted") == pr, s"$p predicted")
          val hits = te.getOrElse((p, pr), 0L)
          assert(r.getAs[Long]("n_hits") == hits, s"$p hits")
          assert(r.getAs[Double]("top1_acc")
            == hits.toDouble / nTest.toDouble)
        case None =>
          assert(r.isNullAt(r.fieldIndex("predicted")))
          assert(r.getAs[Long]("n_hits") == 0L)
      }
    }
    // the temporal holdout property: total pairs = per-segment pairs,
    // i.e. the (user, boundary-crossing) transition is never counted
    val allPairs = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      es.length - 1 }.map(math.max(0, _)).sum
    val crossing = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.drop(1))
        .count { case (a, b) => seg(a._2) != seg(b._2) } }.sum
    assert(pairs(0).size + pairs(1).size == allPairs - crossing)
    assert(crossing > 0,
      "corpus exercises no boundary-crossing pair — the exclusion is untested")
  }
}
