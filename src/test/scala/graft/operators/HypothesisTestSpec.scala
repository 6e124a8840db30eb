package graft.operators

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}
import graft.functions.DeterministicHash
import org.apache.spark.sql.functions._

/** Semantic anchors for the round-11 hypothesis-testing family:
  * q214 log-rank, q215 permutation test, q216 BH-FDR — each checked
  * against a brute-force driver-side recomputation on the real
  * sf0.001 corpus (and, for q214, a balanced synthetic corpus whose
  * statistic must be exactly zero). */
class HypothesisTestSpec extends SparkSpec {
  import spark.implicits._

  private def ucRows: Array[(Long, Long)] =
    graft.Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100) as bigint)"))
        .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("q214: mirror-balanced arms give O-E == 0 and z == 0 exactly") {
    // Every duration appears once per arm: d1 = d/2 and n1 = n/2 at
    // every event time, so each O-E term is exactly 0 in IEEE terms.
    val t0 = 1700000000000000L
    def ts(day: Long) = new Timestamp((t0 + day * 86400000000L) / 1000)
    val rows = (0 until 10).flatMap { i =>
      val uid = i.toLong * 2 // arm 0
      val mirror = i.toLong * 2 + 1 // arm 1, identical timeline
      Seq(
        (uid, ts(0), 10L + uid, "signup", 0.0),
        (uid, ts(i.toLong % 4 + 1), 100L + uid, "purchase", 1.0),
        (mirror, ts(0), 10L + mirror, "signup", 0.0),
        (mirror, ts(i.toLong % 4 + 1), 100L + mirror, "purchase", 1.0))
    }
    val ev = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val r = TemporalQueries.logRankTest(ev).collect() match {
      case Array(one) => one }
    assert(r.getAs[Long]("users0") == 10 && r.getAs[Long]("users1") == 10)
    assert(r.getAs[Double]("o_minus_e") == 0.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("q214: statistic equals the brute-force recomputation on sf0.001") {
    val ev = graft.Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L,
        r.getString(2)))
    val horizon = ev.map(_._2).max
    val su = ev.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2).min }
    val durs = su.toSeq.map { case (u, sTs) =>
      val p = ev.filter(e => e._1 == u && e._3 == "purchase" && e._2 >= sTs)
      val (tUs, evd) =
        if (p.nonEmpty) (p.map(_._2).min - sTs, 1L) else (horizon - sTs, 0L)
      (u % 2, tUs / 86400000000L, evd)
    }
    val grid = durs.groupBy(_._2).map { case (day, rs) =>
      (day, rs.map(_._3).sum, rs.filter(_._1 == 1).map(_._3).sum,
        rs.size.toLong, rs.count(_._1 == 1).toLong)
    }.toSeq.sortBy(_._1)
    var oe = 0.0
    var v = 0.0
    var nEventDays = 0L
    for ((day, d, d1, _, _) <- grid) {
      val n = grid.filter(_._1 >= day).map(_._4).sum
      val n1 = grid.filter(_._1 >= day).map(_._5).sum
      if (d >= 1 && n > 1) {
        nEventDays += 1
        oe += d1.toDouble - d.toDouble * n1.toDouble / n.toDouble
        v += (d.toDouble * n1.toDouble / n.toDouble) *
          ((n - n1).toDouble / n.toDouble) *
          ((n - d).toDouble / (n - 1).toDouble)
      }
    }
    val r = SparkEntry.queries("q214_logrank_test")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("users0") == durs.count(_._1 == 0))
    assert(r.getAs[Long]("users1") == durs.count(_._1 == 1))
    assert(r.getAs[Long]("d0_total")
      == durs.filter(_._1 == 0).map(_._3).sum)
    assert(r.getAs[Long]("d1_total")
      == durs.filter(_._1 == 1).map(_._3).sum)
    assert(r.getAs[Long]("n_event_days") == nEventDays)
    assert(r.getAs[Double]("o_minus_e") == oe,
      s"o_minus_e ${r.getAs[Double]("o_minus_e")} != brute $oe")
    assert(r.getAs[Double]("var_lr") == v)
    assert(r.getAs[Double]("z") == oe / math.sqrt(v))
  }

  test("q215: n_ge and p equal the brute-force permutation null") {
    val uc = ucRows
    val n = uc.length.toLong
    val s = uc.map(_._2).sum
    val n1 = uc.count(_._1 % 2 == 1).toLong
    val s1 = uc.filter(_._1 % 2 == 1).map(_._2).sum
    val obsNum = BigInt(s1) * (n - n1) - BigInt(s - s1) * n1
    val obsDen = BigInt(n1) * (n - n1)
    var nGe = 0L
    for (b <- 1 to 199) {
      val picks = uc.filter { case (uid, _) =>
        (DeterministicHash.knuth32Local(uid * 200 + b,
          DeterministicHash.permSalt) % 1000) < 500 }
      val n1b = picks.length.toLong
      val s1b = picks.map(_._2).sum
      val pNum = BigInt(s1b) * (n - n1b) - BigInt(s - s1b) * n1b
      val pDen = BigInt(n1b) * (n - n1b)
      if (pNum.abs * obsDen >= obsNum.abs * pDen) nGe += 1
    }
    val r = SparkEntry.queries("q215_permutation_test")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("n_users") == n)
    assert(r.getAs[Long]("n_ge") == nGe, s"n_ge != brute $nGe")
    assert(r.getAs[Double]("p_value") == (1L + nGe).toDouble / 200.0)
    // a permutation p can never be 0 (the add-one convention) and the
    // observed labeling itself is not in the null set, so p in (0, 1]
    assert(r.getAs[Double]("p_value") > 0.0
      && r.getAs[Double]("p_value") <= 1.0)
  }

  test("q216: per-type p-values and the BH step match brute force") {
    val uct = graft.Tables.events(spark, sf0001)
      .groupBy("user_id", "event_type")
      .agg(sum(expr("cast(round(value * 100) as bigint)"))
        .cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val types = uct.map(_._2).distinct.sorted
    val pNums = types.map { t =>
      val uc = uct.filter(_._2 == t).map(r => (r._1, r._3))
      val n = uc.length.toLong
      val s = uc.map(_._2).sum
      val n1 = uc.count(_._1 % 2 == 1).toLong
      val s1 = uc.filter(_._1 % 2 == 1).map(_._2).sum
      val obsNum = BigInt(s1) * (n - n1) - BigInt(s - s1) * n1
      val obsDen = BigInt(n1) * (n - n1)
      var nGe = 0L
      for (b <- 1 to 199) {
        val picks = uc.filter { case (uid, _) =>
          (DeterministicHash.knuth32Local(uid * 200 + b,
            DeterministicHash.permSalt) % 1000) < 500 }
        val n1b = picks.length.toLong
        val s1b = picks.map(_._2).sum
        val pNum = BigInt(s1b) * (n - n1b) - BigInt(s - s1b) * n1b
        val pDen = BigInt(n1b) * (n - n1b)
        if (pNum.abs * obsDen >= obsNum.abs * pDen) nGe += 1
      }
      t -> (1L + nGe)
    }.toMap
    val m = types.length.toLong
    val ranked = types.sortBy(t => (pNums(t), t)).zipWithIndex
      .map { case (t, i) => t -> (i + 1L) }.toMap
    val kStar = ranked.collect { case (t, rn)
      if pNums(t) * m * 100 <= rn * 200 * 5 => rn }
      .foldLeft(0L)(math.max)
    val rows = SparkEntry.queries("q216_bh_fdr")(spark, sf0001).collect()
    assert(rows.length == types.length)
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("p_num") == pNums(t), s"$t p_num")
      assert(r.getAs[Long]("p_rank") == ranked(t), s"$t rank")
      assert(r.getAs[Long]("k_star") == kStar)
      assert(r.getAs[Boolean]("reject_5pct") == (ranked(t) <= kStar))
    }
  }
}
