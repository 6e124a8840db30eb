package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic anchors for the q185/q186 sketch-audit family: both
  * sketches are recomputed BRUTE-FORCE in plain Scala over the
  * collected sf0.001 key frequencies (1,500 orders over ~1,000
  * customers — cheap to hold) and compared cell-for-cell, so the
  * engine's hash/fold machinery is checked against an independent
  * implementation, not an oracle sharing its SQL shape. */
class SketchAuditSpec extends SparkSpec {

  private val P = 2147483647L

  /** Exact per-customer order counts at sf0.001, collected once. */
  private lazy val exact: Map[Long, Long] =
    spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("q185 CMS: estimates == brute-force sketch; overestimate theorem") {
    val hashes = Seq((1103515245L, 12345L), (214013L, 2531011L),
      (134775813L, 1L), (69069L, 362437L))
    def cell(a: Long, b: Long, k: Long) = ((a * k + b) % P) % 256L
    // brute-force sketch: 4 x 256 cells from the keyed partials
    val sketch = hashes.map { case (a, b) =>
      exact.toSeq.groupBy { case (k, _) => cell(a, b, k) }
        .map { case (c, xs) => c -> xs.map(_._2).sum }
    }
    val top = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(20)
    val want = top.map { case (k, cnt) =>
      val est = hashes.zipWithIndex.map { case ((a, b), i) =>
        sketch(i)(cell(a, b, k)) }.min
      (k, cnt, est, est - cnt)
    }
    val got = SparkEntry.queries("q185_countmin_estimate")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want, s"first divergence: ${got.zip(want).find(p => p._1 != p._2)}")
    got.foreach { case (k, _, _, over) =>
      assert(over >= 0L, s"CMS underestimated key $k — impossible") }
  }

  test("q186 AMS F2: exact moment and median-of-5 == brute force") {
    val hashes = Seq((1103515245L, 12345L), (214013L, 2531011L),
      (134775813L, 1L), (69069L, 362437L), (1664525L, 1013904223L))
    val f2Exact = exact.values.map(c => c * c).sum
    val ests = hashes.map { case (a, b) =>
      val s = exact.map { case (k, c) =>
        (1L - 2L * (((a * k + b) % P) % 2L)) * c }.sum
      s * s
    }.sorted
    val r = SparkEntry.queries("q186_ams_f2_sketch")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("f2_exact") == f2Exact)
    assert(r.getAs[Long]("f2_min") == ests.head)
    assert(r.getAs[Long]("f2_med") == ests(2))
    assert(r.getAs[Long]("f2_max") == ests.last)
    assert(r.getAs[Double]("rel_err")
      == (ests(2) - f2Exact).toDouble / f2Exact.toDouble)
    assert(r.getAs[Long]("f2_min") <= r.getAs[Long]("f2_med")
      && r.getAs[Long]("f2_med") <= r.getAs[Long]("f2_max"))
  }

  test("q190 KMV: order statistics and estimates == brute force") {
    val hs = exact.keySet.toSeq
      .map(k => ((1103515245L * k + 12345L) % P)).sorted
    val dExact = exact.size.toLong
    val want = Seq(16, 64, 128).map { k =>
      val hk = hs(k - 1)
      val est = ((k - 1).toLong * P).toDouble / hk.toDouble
      (k.toLong, hk, dExact, est,
        (est - dExact.toDouble) / dExact.toDouble)
    }
    val got = SparkEntry.queries("q190_kmv_distinct_estimate")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want, s"got $got\nwant $want")
    // the estimate curve is sane: every point within 50% at n=150
    got.foreach { case (k, _, _, _, err) =>
      assert(math.abs(err) < 0.5, s"k=$k rel_err $err out of band") }
  }

  test("q191 theta: samples, theta, and estimates == brute force") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey").as("k"), year(col("o_orderdate")).as("y"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    def pop(y: Int) = orders.filter(_._2 == y).map(_._1).toSet
    val (a, b) = (pop(1995), pop(1996))
    def hv(k: Long) = (1103515245L * k + 12345L) % P
    def kmv(xs: Set[Long]) = xs.toSeq.map(hv).sorted.take(64)
    val (ka, kb) = (kmv(a), kmv(b))
    val theta = math.min(ka.max, kb.max)
    val uCnt = (ka.toSet ++ kb.toSet).count(_ < theta).toLong
    val iCnt = (ka.toSet & kb.toSet).count(_ < theta).toLong
    val nInter = (a & b).size.toLong
    val nUnion = (a ++ b).size.toLong
    val r = SparkEntry.queries("q191_theta_set_ops")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
    assert(r.getAs[Long]("n_inter") == nInter)
    assert(r.getAs[Long]("n_union") == nUnion)
    assert(r.getAs[Long]("theta") == theta)
    assert(r.getAs[Long]("union_sample") == uCnt)
    assert(r.getAs[Long]("inter_sample") == iCnt)
    assert(r.getAs[Double]("est_union")
      == (uCnt * P).toDouble / theta.toDouble)
    assert(r.getAs[Double]("est_inter")
      == (iCnt * P).toDouble / theta.toDouble)
    assert(r.getAs[Double]("jaccard_exact")
      == nInter.toDouble / nUnion.toDouble)
  }
}
