package graft.operators

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic anchors for the round-10 robust-statistics family:
  * q199 Goodman-Kruskal lambda, q200 IPS off-policy evaluation,
  * q201 Nelson-Aalen, q202 Spearman rho, q203 trimmed/winsorized
  * means, q204 FD profiling — each checked against a brute-force
  * driver-side recomputation on the real sf0.001 corpus (and, for
  * q201, a hand-computed curve on synthetic events). */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("q199: lambdas equal the brute-force PRE computation") {
    val pairs = graft.Tables.documents(spark, sf0001)
      .select("lang", "source").as[(String, String)].collect()
    val grid = pairs.groupBy(identity).map { case (k, v) =>
      (k._1, k._2, v.length.toLong) }.toSeq
    val n = pairs.length.toLong
    val sumRowMax = grid.groupBy(_._1).values.map(_.map(_._3).max).sum
    val sumColMax = grid.groupBy(_._2).values.map(_.map(_._3).max).sum
    val maxLangMarg = grid.groupBy(_._1).values.map(_.map(_._3).sum).max
    val maxSrcMarg = grid.groupBy(_._2).values.map(_.map(_._3).sum).max
    val r = SparkEntry.queries("q199_gk_lambda")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("n_total") == n)
    assert(r.getAs[Long]("sum_row_max") == sumRowMax)
    assert(r.getAs[Long]("sum_col_max") == sumColMax)
    assert(r.getAs[Long]("max_lang_marg") == maxLangMarg)
    assert(r.getAs[Long]("max_source_marg") == maxSrcMarg)
    assert(r.getAs[Double]("lambda_source_given_lang")
      == (sumRowMax - maxSrcMarg).toDouble / (n - maxSrcMarg).toDouble)
    assert(r.getAs[Double]("lambda_lang_given_source")
      == (sumColMax - maxLangMarg).toDouble / (n - maxLangMarg).toDouble)
    assert(r.getAs[Double]("lambda_sym")
      == (sumRowMax + sumColMax - maxSrcMarg - maxLangMarg).toDouble
        / (2 * n - maxSrcMarg - maxLangMarg).toDouble)
    // PRE measures live in [0, 1]
    Seq("lambda_source_given_lang", "lambda_lang_given_source",
      "lambda_sym").foreach { c =>
      val v = r.getAs[Double](c); assert(v >= 0.0 && v <= 1.0, s"$c=$v")
    }
  }

  test("q200: per-action IPS terms equal the brute-force closed form") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    val byA = ev.groupBy(_._1).map { case (a, xs) =>
      a -> (xs.length.toLong, xs.map(_._2).sum) }
    val k = byA.size.toLong
    val n = ev.length.toLong
    val got = SparkEntry.queries("q200_ips_offpolicy")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == byA.keySet)
    byA.foreach { case (a, (na, cents)) =>
      val r = got(a)
      assert(r.getAs[Long]("n_a") == na)
      assert(r.getAs[Long]("reward_cents") == cents)
      assert(r.getAs[Long]("n_total") == n)
      assert(r.getAs[Long]("k_actions") == k)
      assert(r.getAs[Double]("on_policy_mean")
        == cents.toDouble / (100L * na).toDouble)
      assert(r.getAs[Double]("ips_uniform_term")
        == cents.toDouble / (100L * k * na).toDouble)
    }
  }

  test("q201: Nelson-Aalen matches the hand-computed hazard; risk frame == q140's") {
    def ts(s: String) = Timestamp.valueOf(s)
    // Same synthetic corpus as the q140 anchor: A event day 1, B
    // censored day 1, C event day 2, D censored day 3.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (2L, ts("2024-01-02 00:00:00"), 1L, "purchase"),
      (3L, ts("2024-01-01 00:00:00"), 2L, "signup"),
      (4L, ts("2024-01-03 00:00:00"), 2L, "purchase"),
      (5L, ts("2024-01-08 12:00:00"), 3L, "signup"),
      (6L, ts("2024-01-07 00:00:00"), 4L, "signup"),
      (7L, ts("2024-01-10 00:00:00"), 99L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TemporalQueries.nelsonAalen(ev)
      .select("t_day", "n_risk", "n_event", "n_censor", "cum_hazard",
        "na_variance")
      .as[(Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 4L, 1L, 1L, 0.25, 0.0625),
      (2L, 2L, 1L, 0L, 0.75, 0.3125),
      (3L, 1L, 0L, 1L, 0.75, 0.3125)), s"${got.toSeq}")
    // On the real corpus: the risk-set columns are exactly q140's
    // (one shared survivalRisk definition), and the hazard is
    // nondecreasing while KM survival is nonincreasing.
    val na = SparkEntry.queries("q201_nelson_aalen")(spark, sf0001)
      .select("t_day", "n_risk", "n_event", "n_censor", "cum_hazard")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    val km = SparkEntry.queries("q140_kaplan_meier")(spark, sf0001)
      .select("t_day", "n_risk", "n_event", "n_censor")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(na.map(r => (r._1, r._2, r._3, r._4)).toSeq == km.toSeq)
    na.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 >= a._5, s"hazard must be nondecreasing: $a -> $b")
    case _ => () }
  }

  test("q202: rho equals the brute-force tie-averaged rank correlation") {
    val xs = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_quantity"), col("l_discount"))
      .as[(Double, Double)].collect()
    def avgRanks(vs: Array[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v); val c = sorted.count(_ == v)
        v -> (below + (c + 1) / 2.0)
      }.toMap
    }
    val rx = avgRanks(xs.map(_._1)); val ry = avgRanks(xs.map(_._2))
    val n = xs.length
    val mx = xs.map(p => rx(p._1)).sum / n
    val my = xs.map(p => ry(p._2)).sum / n
    val s12 = xs.map(p => (rx(p._1) - mx) * (ry(p._2) - my)).sum
    val s11 = xs.map(p => math.pow(rx(p._1) - mx, 2)).sum
    val s22 = xs.map(p => math.pow(ry(p._2) - my, 2)).sum
    val want = s12 / (math.sqrt(s11) * math.sqrt(s22))
    val r = SparkEntry.queries("q202_spearman_rho")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("n_x_levels") == xs.map(_._1).distinct.length.toLong)
    assert(r.getAs[Long]("n_y_levels") == xs.map(_._2).distinct.length.toLong)
    val rho = r.getAs[Double]("rho")
    assert(math.abs(rho - want) < 1e-12, s"$rho != $want")
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("q203: trimmed/winsorized means equal the brute-force order-statistics fold") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .join(broadcast(graft.Tables.part(spark, sf0001)
        .select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(String, Long)].collect()
    val got = SparkEntry.queries("q203_trimmed_means")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val byBrand = li.groupBy(_._1)
    assert(got.keySet == byBrand.keySet)
    byBrand.foreach { case (brand, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong; val k = n / 10
      val keptSlice = sorted.slice(k.toInt, (n - k).toInt)
      val lo = sorted(k.toInt); val hi = sorted((n - k - 1).toInt)
      val r = got(brand)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == k)
      assert(r.getAs[Long]("lo_cents") == lo, s"$brand lo")
      assert(r.getAs[Long]("hi_cents") == hi, s"$brand hi")
      assert(r.getAs[Double]("trimmed_mean")
        == keptSlice.sum.toDouble / (100L * keptSlice.length).toDouble)
      assert(r.getAs[Double]("winsor_mean")
        == (keptSlice.sum + k * lo + k * hi).toDouble / (100L * n).toDouble)
      // robustness sanity: both estimators sit inside the value range
      assert(r.getAs[Double]("trimmed_mean") * 100 >= lo
        && r.getAs[Double]("trimmed_mean") * 100 <= hi)
    }
  }

  test("q204: g3 errors equal brute force; the key-determined FD is exact") {
    def g3(pairs: Array[(String, String)]): (Long, Long, Long, Long) = {
      val cells = pairs.groupBy(identity).map { case (k, v) =>
        (k._1, k._2, v.length.toLong) }.toSeq
      val n = pairs.length.toLong
      val groups = cells.groupBy(_._1)
      val sumMax = groups.values.map(_.map(_._3).max).sum
      (n, groups.size.toLong, cells.length.toLong, n - sumMax)
    }
    val part = graft.Tables.part(spark, sf0001)
    val want = Map(
      "part.p_brand" -> g3(part.select(col("p_brand"), col("p_type"))
        .as[(String, String)].collect()),
      "part.p_partkey" -> g3(part
        .select(col("p_partkey").cast("string"), col("p_brand"))
        .as[(String, String)].collect()),
      "customer.c_mktsegment" -> g3(graft.Tables.customer(spark, sf0001)
        .select(col("c_mktsegment"), col("c_nationkey").cast("string"))
        .as[(String, String)].collect()))
    val got = SparkEntry.queries("q204_fd_profile")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == 6)
    want.foreach { case (det, (n, groups, cells, viol)) =>
      val r = got(det)
      assert(r.getAs[Long]("n_rows") == n, det)
      assert(r.getAs[Long]("n_groups") == groups, det)
      assert(r.getAs[Long]("n_cells") == cells, det)
      assert(r.getAs[Long]("g3_violations") == viol, det)
      assert(r.getAs[Long]("is_fd") == (if (viol == 0) 1L else 0L), det)
      assert(r.getAs[Double]("conformance")
        == (n - viol).toDouble / n.toDouble, det)
    }
    // the key-determined candidate is the anchor for the zero case
    assert(got("part.p_partkey").getAs[Long]("is_fd") == 1L)
    assert(got("part.p_partkey").getAs[Long]("g3_violations") == 0L)
    assert(got("part.p_brand").getAs[Long]("is_fd") == 0L)
  }
}
