package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q234 semantic anchors: (1) a hand value-cum frame whose CvM
  * statistic is computable on paper (disjoint singletons -> T = 1/4);
  * (2) the sf0.001 catalog output equals a plain-Scala refold of the
  * ECDF form (exact BigInt weighted-square fold, identical IEEE
  * shapes for t_stat/e_t). */
class CramerVonMisesSpec extends SparkSpec {

  test("q234: hand frame — disjoint singletons give T = 1/4") {
    import spark.implicits._
    // x = {1} in arm1, y = {2} in arm0: at v=1 F1=1, F0=0 (gap 1,
    // weight 1); at v=2 both 1 (gap 0). T = 1 / (1*1*(1+1)^2) = 0.25.
    val f = Seq((1L, 1L, 0L, 1L, 0L), (2L, 0L, 1L, 1L, 1L))
      .toDF("v", "c1", "c0", "f1", "f0")
    val r = ExtendedQueries.cramerVonMises(f).collect().head
    assert(r.getAs[Long]("n1") == 1L && r.getAs[Long]("n0") == 1L)
    assert(r.getAs[Double]("s_num") == 1.0)
    assert(r.getAs[Double]("t_stat") == 0.25)
    assert(r.getAs[Long]("reject_05") == 0L)
  }

  test("q234: sf0.001 equals the sequential refold") {
    val obs = graft.Tables.orders(spark, sf0001)
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        expr("((o_custkey % 2) + 2) % 2").cast("long").as("arm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byV = obs.groupBy(_._1).map { case (v, xs) =>
      (v, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }.toSeq.sortBy(_._1)
    val n1 = byV.map(_._2).sum
    val n0 = byV.map(_._3).sum
    var f1 = 0L
    var f0 = 0L
    var sBig = BigInt(0)
    byV.foreach { case (_, c1, c0) =>
      f1 += c1; f0 += c0
      val dnum = BigInt(f1 * n0 - f0 * n1)
      sBig += BigInt(c1 + c0) * dnum * dnum
    }
    val sNum = sBig.toDouble
    val tStat = sNum / ((n1 * n0).toDouble *
      ((n1 + n0).toDouble * (n1 + n0).toDouble))
    val eT = (n1 + n0 + 1L).toDouble / (6.0 * (n1 + n0).toDouble)

    val r = SparkEntry.queries("q234_cramer_von_mises")(spark, sf0001)
      .collect().head
    assert(r.getAs[Long]("n1") == n1)
    assert(r.getAs[Long]("n0") == n0)
    assert(r.getAs[Double]("s_num") == sNum)
    assert(r.getAs[Double]("t_stat") == tStat)
    assert(r.getAs[Double]("e_t") == eT)
    // parity-split arms of the same distribution: the test must NOT
    // scream shift (T near its null expectation, far under 0.461)
    assert(r.getAs[Long]("reject_05") == 0L,
      s"parity arms rejected: t=$tStat")
    assert(tStat > 0.0)
  }
}
