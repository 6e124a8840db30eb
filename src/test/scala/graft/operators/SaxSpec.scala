package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q257 SAX semantics: segment assignment law, z-chain equality with a
  * brute Scala fold, symbol breakpoints, and corpus invariants. */
class SaxSpec extends SparkSpec {
  import spark.implicits._

  private def ordersOf(daily: Seq[(String, Double)]) =
    daily.toDF("o_orderdate", "o_totalprice")

  test("hand series: z-scores and symbols equal the brute fold") {
    // 8 days, one order each, revenues 10..80 -> seg i holds day i
    val days = (0 until 8).map(i => (f"1995-01-0${i + 1}%d", (i + 1) * 10.0))
    val got = TemporalQueries.saxSymbols(ordersOf(days), segments = 8)
      .as[(Long, Long, Long, Double, String)].collect().toList
    val rev = (1 to 8).map(_ * 10L)
    val n = 8L
    val t = rev.sum
    val q = rev.map(r => r * r).sum
    val mu = t.toDouble / n
    val sigma = math.sqrt(q.toDouble / n - mu * mu)
    val want = rev.zipWithIndex.map { case (r, i) =>
      val z = (r.toDouble / 1.0 - mu) / sigma
      val sym = if (z < -0.67) "a" else if (z < 0.0) "b"
        else if (z < 0.67) "c" else "d"
      (i.toLong, 1L, r, z, sym)
    }.toList
    assert(got == want, s"got $got want $want")
    // symmetric ramp: symbols run a/b..c/d, monotone non-decreasing
    assert(got.map(_._5) == got.map(_._5).sorted)
  }

  test("multi-order days round PER ORDER then fold to exact dollar sums") {
    val orders = Seq(
      ("1995-01-01", 10.4), ("1995-01-01", 10.4),  // 10 + 10, not round(20.8)
      ("1995-01-02", 50.0)).toDF("o_orderdate", "o_totalprice")
    val got = TemporalQueries.saxSymbols(orders, segments = 2)
      .as[(Long, Long, Long, Double, String)].collect().toList
    assert(got.map(r => (r._1, r._2, r._3)) ==
      List((0L, 1L, 20L), (1L, 1L, 50L)), s"$got")
  }

  test("corpus: 16 contiguous segments, conserved totals, earned symbols") {
    val got = graft.SparkEntry.queries("q257_sax_symbols")(spark, sf0001)
      .as[(Long, Long, Long, Double, String)].collect().toList
    assert(got.map(_._1) == (0L until 16L).toList,
      s"segments not contiguous: ${got.map(_._1)}")
    val total = graft.Tables.orders(spark, sf0001)
      .agg(sum(round(col("o_totalprice")).cast("long"))).as[Long].head()
    assert(got.map(_._3).sum == total, "segment revenue not conserved")
    assert(got.forall(r => Set("a", "b", "c", "d")(r._5)))
    // z-scores of segment means around 0: both signs present on a
    // ~2.4k-day corpus
    assert(got.exists(_._4 < 0) && got.exists(_._4 > 0))
  }
}
