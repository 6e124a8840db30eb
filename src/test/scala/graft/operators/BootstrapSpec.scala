package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.functions.DeterministicHash
import org.apache.spark.sql.functions._

/** q225 semantic anchor: the distributed Poisson bootstrap equals a
  * plain-Scala sequential refold — same hash, same fixed Poisson(1)
  * thresholds, same exact-rational rank election — bit for bit; and
  * the order-statistic structure holds (80% interval nested inside
  * 95%, endpoints are actual replicate means). */
class BootstrapSpec extends SparkSpec {

  private val thresholds =
    Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L,
      999990L)

  private def weight(userId: Long, b: Long): Long = {
    val h6 = DeterministicHash.knuth32Local(userId * 200L + b,
      DeterministicHash.bootSalt) % 1000000L
    val i = thresholds.indexWhere(h6 < _)
    if (i < 0) 8L else i.toLong
  }

  test("q225: endpoints equal the sequential refold; intervals nest") {
    val users = graft.Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100) as bigint)"))
        .cast("long").as("cents"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cents")))
    val B = 199

    // replicate stats via the same weight rule
    val reps = (1 to B).map { b =>
      var nb = 0L; var sb = 0L
      users.foreach { case (u, c) =>
        val w = weight(u, b.toLong); nb += w; sb += w * c
      }
      (b.toLong, nb, sb)
    }
    // exact-rational total order: rank_i = #{j: m_j < m_i or tie, j <= i}
    def rank(i: (Long, Long, Long)): Int = reps.count { j =>
      val l = BigInt(j._3) * BigInt(i._2)
      val r = BigInt(i._3) * BigInt(j._2)
      l < r || (l == r && j._1 <= i._1)
    }
    val byRank = reps.map(r => rank(r) -> r).toMap
    assert(byRank.size == B, "ranks form a total order")
    def mean(r: (Long, Long, Long)): Double = r._3.toDouble / r._2.toDouble

    val rows = SparkEntry.queries("q225_poisson_bootstrap_ci")(spark, sf0001)
      .orderBy("conf_pct").collect()
    assert(rows.map(_.getAs[Long]("conf_pct")).toSeq == Seq(80L, 95L))
    for (row <- rows) {
      val lo = byRank(row.getAs[Long]("lo_rank").toInt)
      val hi = byRank(row.getAs[Long]("hi_rank").toInt)
      assert(row.getAs[Double]("ci_lo_mean") == mean(lo), "lo endpoint")
      assert(row.getAs[Double]("ci_hi_mean") == mean(hi), "hi endpoint")
    }
    // nesting: the 80% interval sits inside the 95% interval
    val r80 = rows.find(_.getAs[Long]("conf_pct") == 80L).get
    val r95 = rows.find(_.getAs[Long]("conf_pct") == 95L).get
    assert(r95.getAs[Double]("ci_lo_mean") <= r80.getAs[Double]("ci_lo_mean"))
    assert(r80.getAs[Double]("ci_hi_mean") <= r95.getAs[Double]("ci_hi_mean"))
    // the interval is non-degenerate and the bootstrap actually moved:
    // some replicate mean differs from the observed mean
    assert(r95.getAs[Double]("ci_lo_mean") < r95.getAs[Double]("ci_hi_mean"))
    val obs = r95.getAs[Double]("obs_mean")
    assert(reps.exists(r => mean(r) != obs), "degenerate resampling")
  }
}
