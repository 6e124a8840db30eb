package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q235/q236 semantic anchors: kappa refolds exactly from the query's
  * own label frame (BigInt contingency algebra), and both statistics
  * prove discriminating power on constructed frames with known answers
  * (the q230 planted-anchor discipline) — perfect agreement gives
  * kappa = 1, marginal-only agreement gives kappa = 0, and McNemar
  * rejects exactly when the discordance is one-sided enough. */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("q235: kappa refolds exactly from the label frame; grid complete") {
    val labs = AgreementQueries.annotatorLabels(
        graft.Tables.documents(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = BigInt(labs.length)
    val agree = BigInt(labs.count { case (a, b) => a == b })
    val rowN = labs.groupBy(_._1).view.mapValues(x => BigInt(x.length)).toMap
    val colN = labs.groupBy(_._2).view.mapValues(x => BigInt(x.length)).toMap
    val peNum = (0L to 2L).map(k =>
      rowN.getOrElse(k, BigInt(0)) * colN.getOrElse(k, BigInt(0))).sum
    val kNum = n * agree - peNum
    val kDen = n * n - peNum

    val rows = SparkEntry.queries("q235_cohens_kappa")(spark, sf0001)
      .collect()
    assert(rows.map(_.getAs[Long]("n_cell")).sum == labs.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n.toLong)
      assert(r.getAs[Long]("agree") == agree.toLong)
      assert(r.getAs[Long]("kappa_num") == kNum.toLong)
      assert(r.getAs[Long]("kappa_den") == kDen.toLong)
      // identical single-shape divisions reproduce the doubles exactly
      assert(r.getAs[Double]("po") == agree.toLong.toDouble / n.toLong)
      assert(r.getAs[Double]("kappa")
        == kNum.toLong.toDouble / kDen.toLong.toDouble)
      val cell = labs.count { case (a, b) =>
        a == r.getAs[Long]("a_label") && b == r.getAs[Long]("b_label") }
      assert(r.getAs[Long]("n_cell") == cell)
    }
    // the corpus terciles really agree far beyond chance
    assert(rows.head.getAs[Double]("kappa") > 0.9)
  }

  test("q235: planted frames — perfect agreement = 1, independence ~ 0") {
    def kappaOf(pairs: Seq[(Long, Long)]): Double =
      AgreementQueries.agreementReadBack(AgreementQueries.agreementGrid(
          pairs.toDF("a", "b")))
        .collect().head.getAs[Double]("kappa")
    val perfect = (0 until 90).map(i => ((i % 3).toLong, (i % 3).toLong))
    assert(kappaOf(perfect) == 1.0)
    // independent labels with uniform marginals: agree = n/3 = pe -> 0
    val indep = for (a <- 0L to 2L; b <- 0L to 2L; _ <- 0 until 10)
      yield (a, b)
    assert(kappaOf(indep) == 0.0)
  }

  test("q236: contingency refolds exactly; planted one-sided rejects") {
    val r = SparkEntry.queries("q236_mcnemar_test")(spark, sf0001)
      .collect().head
    val b = r.getAs[Long]("b_disc"); val c = r.getAs[Long]("c_disc")
    assert(r.getAs[Long]("n")
      == spark.read.parquet(s"$sf0001/documents.parquet").count())
    val expect = if (b + c == 0) 0.0
      else ((b - c) * (b - c)).toDouble / (b + c).toDouble
    assert(r.getAs[Double]("mcnemar_stat") == expect)
    assert(r.getAs[Long]("reject_05") == (if (expect > 3.841) 1L else 0L))

    // planted frames through the REAL query path: texts constructed to
    // hit known cells of the 2x2. Truth = n_chars >= 385; A = tokens
    // >= 70; B = 'e' count >= 30.
    val longBoth = (400L, Seq.fill(70)("see").mkString(" "))  // tr,A,B all 1
    val longAOnly = (400L, Seq.fill(70)("ab").mkString(" "))  // A right, B wrong
    val longBOnly = (400L, "see " * 15 + "bee " * 15)         // 30 toks, 60 e's
    def run(rows: Seq[(Long, String)]): (Long, Long, Double, Long) = {
      val df = AgreementQueries.mcnemar(
        rows.toDF("n_chars", "text")).collect().head
      (df.getAs[Long]("b_disc"), df.getAs[Long]("c_disc"),
        df.getAs[Double]("mcnemar_stat"), df.getAs[Long]("reject_05"))
    }
    // one-sided: b=10, c=0 -> stat 10 > 3.841 -> reject
    assert(run(Seq.fill(10)(longAOnly) ++ Seq.fill(40)(longBoth))
      == ((10L, 0L, 10.0, 1L)))
    // balanced discordance: b=c=5 -> stat 0, no reject
    assert(run(Seq.fill(5)(longAOnly) ++ Seq.fill(5)(longBOnly))
      == ((5L, 5L, 0.0, 0L)))
    // zero discordance guard: stat defined as 0
    assert(run(Seq.fill(8)(longBoth)) == ((0L, 0L, 0.0, 0L)))
  }
}
