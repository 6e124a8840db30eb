package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q132 quantile normalization + q133 chi-square independence:
  * closed-form synthetic anchors beyond the DuckDB hash gate. */
class DistributionStatsSpec extends SparkSpec {
  import spark.implicits._

  test("q132: pct spans [0,1] per type, ties share, min->0 and max->1") {
    val rows = SparkEntry.queries("q132_quantile_normalize")(spark, sf0001)
      .select("event_type", "value", "pct")
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val minV = g.map(_._2).min
      val maxV = g.map(_._2).max
      assert(g.filter(_._2 == minV).forall(_._3 == 0.0), "min value -> pct 0")
      assert(g.filter(_._2 == maxV).forall(_._3 == 1.0), "max value -> pct 1")
      // equal values must share one pct (rank, not row_number)
      g.groupBy(_._2).foreach { case (_, same) =>
        assert(same.map(_._3).distinct.length == 1, "ties must share pct")
      }
    }
  }

  test("q133: chi2 is 0 under perfect independence; matches a 2x2 closed form") {
    // perfectly independent 2x2: every (i, j) cell equally filled
    val indep = (for { i <- 1 to 2; j <- Seq("A", "B"); _ <- 1 to 10 }
      yield (i, j)).toDF("i", "j")
    val zero = ExtendedQueries.chiSquareIndependence(indep)
      .select("chi2", "dof", "n").as[(Double, Long, Long)].collect().head
    assert(zero == ((0.0, 1L, 40L)), s"$zero")
    // dependent 2x2 with O = [[30,10],[10,30]]: chi2 = n*(ad-bc)^2 /
    // (r1*r2*c1*c2) = 80*(900-100)^2/40^4 = 20, V = sqrt(20/80) = 0.5
    val dep = (Seq.fill(30)((1, "A")) ++ Seq.fill(10)((1, "B")) ++
      Seq.fill(10)((2, "A")) ++ Seq.fill(30)((2, "B"))).toDF("i", "j")
    val got = ExtendedQueries.chiSquareIndependence(dep)
      .select("chi2", "n_cells", "dof", "n", "cramers_v")
      .as[(Double, Long, Long, Long, Double)].collect().head
    assert(math.abs(got._1 - 20.0) < 1e-9 && got._2 == 4L && got._3 == 1L &&
      got._4 == 80L && math.abs(got._5 - 0.5) < 1e-12, s"$got")
  }

  test("q148: pairs are ordered, inside the 24h window, and complete") {
    val rows = graft.SparkEntry.queries("q148_duplicate_orders")(spark, sf001)
      .select("order_a", "order_b", "gap_sec")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty, "the corpus has same-day repeat orders")
    rows.foreach { case (a, b, gap) =>
      assert(a < b, s"pair orientation: ($a, $b)")
      assert(math.abs(gap) <= 86400L, s"window: gap $gap")
    }
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length,
      "one row per pair")
  }

  test("q149: HHI sits in [1/n, 1] and single-supplier parts hit exactly 1") {
    val rows = graft.SparkEntry.queries("q149_supplier_hhi")(spark, sf001)
      .select("n_suppliers", "hhi", "top_share")
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, hhi, top) =>
      assert(hhi >= 1.0 / n - 1e-12 && hhi <= 1.0 + 1e-12, s"n=$n hhi=$hhi")
      assert(top >= 1.0 / n - 1e-12 && top <= 1.0 + 1e-12, s"top=$top")
      // HHI = sum(s^2) <= max(s) * sum(s) = top share, always
      assert(hhi <= top + 1e-12, s"HHI cannot exceed the top share: $hhi $top")
      if (n == 1L) assert(hhi == 1.0 && top == 1.0, "single-sourced = 1")
    }
    assert(rows.exists(_._1 > 1L), "corpus should have multi-sourced parts")
    // the [1/n, 1] floor is attained when a part's suppliers ship equal
    // quantities; verify the bound is TIGHT somewhere (hhi near 1/n)
    assert(rows.exists(r => r._2 <= 1.5 / r._1),
      "no part anywhere near the diversified floor is suspicious")
  }

  test("q136: every (label, fold) cell is populated, totals reconcile, shares balance") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val rows = ExtendedQueries.kfoldBalance(emb.select("vec_id", "label"), k = 5)
      .select("label", "fold", "n", "label_n", "share")
      .as[(Int, Long, Long, Long, Double)].collect()
    val labels = rows.map(_._1).distinct
    assert(rows.length == labels.length * 5, "all k folds present per label")
    labels.foreach { l =>
      val g = rows.filter(_._1 == l)
      assert(g.map(_._3).sum == g.head._4, s"label $l counts reconcile")
      // equidistribution: each fold within a loose 3-sigma binomial band
      val n = g.head._4.toDouble
      val sigma = math.sqrt(n * 0.2 * 0.8)
      g.foreach(r => assert(math.abs(r._3 - n / 5) <= 3 * sigma + 1,
        s"fold share off: $r"))
    }
    // determinism: re-running yields the identical assignment
    val again = ExtendedQueries.kfoldBalance(emb.select("vec_id", "label"), k = 5)
      .select("label", "fold", "n").as[(Int, Long, Long)].collect()
    assert(again.toSeq == rows.map(r => (r._1, r._2, r._3)).toSeq)
  }
}
