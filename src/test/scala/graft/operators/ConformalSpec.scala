package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q212 split-conformal + q213 cardinality audit semantic anchors. */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(sf: String) =
    SparkEntry.queries("q212_conformal_coverage")(spark, sf)
      .select(col("alpha_pct"), col("n_cal"), col("n_test"), col("k_rank"),
        col("qhat_cents"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double")))
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .sortBy(_._1)

  test("q212: qhat is exactly the k-th smallest calibration score") {
    // independent replay: recompute the calibration scores driver-side
    val h = graft.functions.DeterministicHash.knuth32(col("event_id"),
      graft.functions.DeterministicHash.conformalSalt)
    val e = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        (h % 1000).as("bucket"))
    val means = e.where(col("bucket") < 500).groupBy("event_type")
      .agg(expr("sum(cents) DIV count(1)").as("m"))
      .as[(String, Long)].collect().toMap
    val cal = e.where(col("bucket") >= 500 && col("bucket") < 750)
      .select(col("event_type"), col("cents"))
      .as[(String, Long)].collect()
      .map { case (t, c) => math.abs(c - means(t)) }.sorted
    rows(sf0001).foreach { case (ap, nCal, _, k, qhat, _, _) =>
      assert(nCal == cal.length.toLong, s"alpha $ap: n_cal")
      val expectK = ((100 - ap) * (nCal + 1) + 99) / 100
      assert(k == expectK, s"alpha $ap: k_rank $k != $expectK")
      assert(qhat == cal((k - 1).toInt), s"alpha $ap: qhat not k-th smallest")
    }
  }

  test("q212: realized coverage clears the conformal target") {
    rows(sf0001).foreach { case (ap, _, nTest, _, _, nCov, cov) =>
      assert(nTest > 0)
      // marginal validity is >= 1 - alpha in expectation; on this fixed
      // deterministic split both alphas clear the target outright
      assert(cov >= 1.0 - ap / 100.0 - 0.05,
        s"alpha $ap%: coverage $cov (covered $nCov of $nTest)")
    }
  }

  test("q213: the count-join actual equals the materialized join count") {
    val out = SparkEntry.queries("q213_join_cardinality_audit")(spark, sf0001)
      .select(col("relationship"), col("n_left"), col("actual_rows"),
        col("est_rows"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val li = graft.Tables.lineitem(spark, sf0001)
    val real = li.join(graft.Tables.orders(spark, sf0001),
      col("l_orderkey") === col("o_orderkey")).count()
    val lo = out("lineitem*orders")
    assert(lo._3 == real, s"count-join actual ${lo._3} != join count $real")
    // referential integrity (q88-audited) makes actual == n_left here
    assert(lo._3 == lo._2)
    out.values.foreach(r => assert(r._4 > 0, s"${r._1}: empty estimate"))
  }
}
