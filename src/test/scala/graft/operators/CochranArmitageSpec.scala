package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q244 semantic anchors: the trend statistic refolds exactly in
  * BigInt from the query's own dose/outcome frame, and planted frames
  * prove discriminating power — a perfectly monotone dose-response
  * rejects, a flat one (equal rates in every group) gives T = 0 and
  * chi2 = 0 exactly. */
class CochranArmitageSpec extends SparkSpec {
  import spark.implicits._

  private def refold(cells: Seq[(Long, Long, Long)])
      : (Long, BigInt, Double) = {
    val n = cells.map(_._2).sum
    val a = cells.map(_._3).sum
    val swa = cells.map(c => c._1 * c._3).sum
    val swn = cells.map(c => c._1 * c._2).sum
    val sw2n = cells.map(c => c._1 * c._1 * c._2).sum
    val t = n * swa - a * swn
    val d = BigInt(a) * BigInt(n - a) *
      (BigInt(n) * BigInt(sw2n) - BigInt(swn) * BigInt(swn))
    // Z = T/N, Var(Z) = D/N^3 -> chi2 = T^2 * N / D (ONE factor of N)
    val chi2 = if (d > 0)
      (BigInt(t) * BigInt(t) * BigInt(n)).toDouble / d.toDouble
    else 0.0
    (t, d, chi2)
  }

  test("q244: statistic refolds exactly; corpus trend rejects") {
    val rows = SparkEntry.queries("q244_cochran_armitage")(spark, sf0001)
      .orderBy("dose").collect()
    val cells = rows.map(r => (r.getAs[Long]("dose"), r.getAs[Long]("n"),
      r.getAs[Long]("a"))).toSeq
    val (t, _, chi2) = refold(cells)
    rows.foreach { r =>
      assert(r.getAs[Long]("t_num") == t)
      assert(r.getAs[Double]("ca_chi2") == chi2)
      assert(r.getAs[Long]("n_tot") == cells.map(_._2).sum)
      assert(r.getAs[Long]("a_tot") == cells.map(_._3).sum)
    }
    // long-document rate rises monotonically with token tercile on the
    // real corpus (measured 0/153, 1/171, 169/176 at sf0.001)
    assert(rows.head.getAs[Long]("reject_05") == 1L)
  }

  test("q244: planted 2-group table equals Pearson chi2 exactly") {
    // dose 0: 2 docs / 0 positive; dose 2: 2 docs / 2 positive.
    // Pearson chi2 on that 2x2 table is N(ad-bc)^2/(r1 r2 c1 c2) = 4;
    // CA trend chi2 is invariant to affine score rescale (w in {0,2}
    // vs {0,1}) so it must equal 4.0 exactly. The pre-fix T^2*N^2/D
    // algebra gives 16 here — this anchor pins the single factor of N.
    val short = (1 to 10).map(i => s"w$i").mkString(" ")   // dose 0
    val long = (1 to 80).map(i => s"w$i").mkString(" ")    // dose 2
    val docs = Seq(
      (100L, short), (100L, short),      // dose 0, y = 0
      (400L, long), (400L, long)         // dose 2, y = 1
    ).toDF("n_chars", "text")
    val rows = AgreementQueries.cochranArmitage(docs).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("ca_chi2") == 4.0)
      assert(r.getAs[Long]("reject_05") == 1L)
    }
  }

  test("q244: planted flat dose-response gives T = 0, chi2 = 0, no reject") {
    def mk(dose: Int, y: Boolean, k: Int) = {
      val ntok = dose match { case 0 => 10; case 1 => 50; case _ => 80 }
      val text = (1 to ntok).map(i => s"w$i").mkString(" ")
      Seq.fill(k)((if (y) 400L else 100L, text))
    }
    // every dose group: 30 docs, 10 positive -> identical rates
    val docs = (0 to 2).flatMap(g => mk(g, true, 10) ++ mk(g, false, 20))
      .toDF("n_chars", "text")
    val rows = AgreementQueries.cochranArmitage(docs).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("t_num") == 0L)
      assert(r.getAs[Double]("ca_chi2") == 0.0)
      assert(r.getAs[Long]("reject_05") == 0L)
    }
  }
}
