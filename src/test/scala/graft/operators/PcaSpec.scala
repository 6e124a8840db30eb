package graft.operators

import graft.SparkSpec
import graft.functions.{CovMoments, SymEigen}
import org.apache.spark.sql.functions._

/** Semantic anchor for the q77/q78 linear-algebra pair: CovMoments'
  * one-buffer reduction must equal the naive two-pass covariance, SymEigen
  * must be a real (and deterministic) eigendecomposition, and pcaWhiten's
  * output must satisfy the whitening contract — identity covariance in
  * the kept subspace — which is the property the q78 catalog
  * entry claims in place of an oracle hash.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val d = 64
  private val n = 300

  // Seeded correlated sample: x = A z with a fixed mixing matrix, so the
  // population covariance is far from diagonal and full-rank.
  private lazy val sample: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(20260813L)
    val mix = Array.tabulate(d, d)((i, j) =>
      if (i == j) 1.0 else 0.3 * math.sin(1.0 + i * 37 + j))
    Seq.fill(n) {
      val z = Array.fill(d)(rnd.nextGaussian())
      Array.tabulate(d)(i => {
        var s = 0.1 * i // distinct means, so centering matters
        var j = 0
        while (j < d) { s += mix(i)(j) * z(j); j += 1 }
        s
      })
    }
  }

  private def naiveCov(xs: Seq[Array[Double]]): Array[Array[Double]] = {
    val m = xs.size
    val mu = Array.tabulate(d)(i => xs.map(_(i)).sum / m)
    Array.tabulate(d, d)((i, j) =>
      xs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / (m - 1))
  }

  test("CovMoments buffer closes to the naive sample covariance and means") {
    val mom = sample.map(_.toSeq).toDS()
      .repartition(7) // force real partial merges
      .select(new CovMoments(d).toColumn)
      .head()
    assert(mom(0) == n.toDouble)
    val cov = CovMoments.covarianceMatrix(mom, d)
    val mu = CovMoments.means(mom, d)
    val expCov = naiveCov(sample)
    val expMu = Array.tabulate(d)(i => sample.map(_(i)).sum / n)
    for (i <- 0 until d) {
      assert(math.abs(mu(i) - expMu(i)) < 1e-9, s"mean($i)")
      for (j <- 0 until d)
        assert(math.abs(cov(i)(j) - expCov(i)(j)) < 1e-8, s"cov($i,$j)")
    }
  }

  test("CovMoments skips null rows like built-in aggregates") {
    val withNulls = (sample.map(_.toSeq) :+ null.asInstanceOf[Seq[Double]])
      .toDS()
      .select(new CovMoments(d).toColumn).head()
    assert(withNulls(0) == n.toDouble)
  }

  test("SymEigen is a real, ordered, sign-fixed, deterministic eigenbasis") {
    val a = naiveCov(sample)
    val (eig, q) = SymEigen.decompose(a)
    // descending eigenvalues
    assert(eig.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // residual ||A v - lambda v|| small for every pair
    for (c <- 0 until d) {
      val v = q(c)
      val av = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      val res = math.sqrt((0 until d).map(i => {
        val r = av(i) - eig(c) * v(i); r * r
      }).sum)
      assert(res < 1e-8, s"eigenpair $c residual $res")
      // sign convention: largest-|component| entry positive
      val k = (0 until d).maxBy(i => math.abs(v(i)))
      assert(v(k) > 0.0, s"sign fix on vector $c")
    }
    // orthonormal rows
    for (c1 <- 0 until d; c2 <- c1 until d) {
      val dot = (0 until d).map(i => q(c1)(i) * q(c2)(i)).sum
      val want = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"orthonormality ($c1,$c2)")
    }
    // pure function of the input
    val (eig2, q2) = SymEigen.decompose(a)
    assert(eig.sameElements(eig2) && q.indices.forall(c => q(c).sameElements(q2(c))))
  }

  test("pcaWhiten output has identity covariance in the kept subspace") {
    val keep = 16
    val emb = sample.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    // output is scalar y0..y15 columns (driver contract: no arrays)
    val y = SimilarityQueries.pcaWhiten(emb, keep)
      .collect().map(r => Array.tabulate(keep)(c => r.getDouble(1 + c)))
    assert(y.length == n && y.forall(_.length == keep))
    val mu = Array.tabulate(keep)(c => y.map(_(c)).sum / n)
    for (c <- 0 until keep)
      assert(math.abs(mu(c)) < 1e-8, s"whitened mean($c)")
    for (c1 <- 0 until keep; c2 <- c1 until keep) {
      val cov = y.map(r => (r(c1) - mu(c1)) * (r(c2) - mu(c2))).sum / (n - 1)
      val want = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-6, s"whitened cov($c1,$c2)=$cov")
    }
  }

  test("q78 catalog audit: every pinned verdict is EARNED on the corpus") {
    val audit = graft.SparkEntry.queries("q78_pca_whitening")(spark, sf0001)
      .as[(Long, Long, Boolean, Boolean)].collect().toList
    assert(audit.map(_._1) == (0L until 16L).toList)
    assert(audit.forall(r => r._3 && r._4),
      s"whitening contract not earned: ${audit.filterNot(r => r._3 && r._4)}")
    assert(audit.forall(_._2 > 0L))
  }
}
