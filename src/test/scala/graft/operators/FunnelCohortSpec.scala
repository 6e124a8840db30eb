package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Semantic anchors for q86 (strict-order funnel) and q87 (weekly
  * retention cohorts) on hand-built streams where every stage and cell
  * is checkable by eye.
  */
class FunnelCohortSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int, h: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("funnel: strict ordering gates each stage") {
    val events = Seq(
      // user 1: full funnel in order -> stage 3
      (1L, t(1, 1), "view"), (1L, t(1, 2), "click"), (1L, t(1, 3), "purchase"),
      // user 2: click BEFORE first view -> click doesn't count -> stage 1
      (2L, t(1, 1), "click"), (2L, t(1, 2), "view"),
      // user 3: purchase before click -> stage 2 only
      (3L, t(1, 1), "view"), (3L, t(1, 2), "purchase"), (3L, t(1, 3), "click"),
      // user 4: no view at all -> stage 0
      (4L, t(1, 1), "purchase"), (4L, t(1, 2), "error"))
      .toDF("user_id", "ts", "event_type")
    val out = TemporalQueries.funnelStages(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(4),
        Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)))).toMap
    assert(out(1L) == ((3L, Some(t(1, 1)), Some(t(1, 2)), Some(t(1, 3)))))
    assert(out(2L) == ((1L, Some(t(1, 2)), None, None)),
      "pre-view click must not advance the funnel")
    assert(out(3L) == ((2L, Some(t(1, 1)), Some(t(1, 3)), None)),
      "pre-click purchase must not advance the funnel")
    assert(out(4L)._1 == 0L)
  }

  test("funnel: earliest qualifying event wins each stage") {
    val events = Seq(
      (1L, t(1, 1), "view"), (1L, t(2, 1), "view"),
      (1L, t(1, 5), "click"), (1L, t(1, 9), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = TemporalQueries.funnelStages(events).collect().head
    assert(out.getTimestamp(1) == t(1, 1) && out.getTimestamp(2) == t(1, 5))
  }

  test("cohorts: hand-built matrix, Monday-week anchoring") {
    // 2024-01-01 is a Monday. u1 first active wk0, again wk0 and wk2;
    // u2 first active wk1 only; u3 joins u1's cohort in wk2.
    val events = Seq(
      (1L, t(2, 1), "view"), (1L, t(4, 1), "click"), (1L, t(16, 1), "view"),
      (2L, t(9, 1), "view"),
      (3L, t(3, 1), "view"), (3L, t(17, 1), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = TemporalQueries.retentionCohorts(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, // u1 + u3 active in their cohort week
      ("2024-01-01", 2L) -> 2L, // both return two weeks later
      ("2024-01-08", 0L) -> 1L)) // u2's one-week cohort
  }

  test("real events: cohort cells conserve users and funnel stages are monotone") {
    val ev = graft.Tables.events(spark, sf001)
    val funnel = TemporalQueries.funnelStages(ev).collect()
    val n = funnel.length
    val byStage = funnel.groupBy(_.getLong(4)).view.mapValues(_.length)
    // stage counts are a survival curve: reaching k implies reaching k-1
    val reached = (0 to 3).map(k => (k.toLong, funnel.count(_.getLong(4) >= k)))
    assert(reached.map(_._2).toSeq == reached.map(_._2).sorted.reverse)
    assert(reached.head._2 == n)
    val cohorts = TemporalQueries.retentionCohorts(ev).collect()
    // every user appears in week 0 of their own cohort
    val week0 = cohorts.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(week0 == ev.select("user_id").distinct().count())
    assert(cohorts.forall(_.getLong(2) > 0))
  }

  test("q187 RFM: quintile grid conserves customers; scores are balanced quintiles") {
    val rows = graft.SparkEntry
      .queries("q187_rfm_segmentation")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nCust = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCust, "grid conserves purchasing customers")
    rows.foreach { case (r, f, m, _, _, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5) }
    // ntile law: each score value of each dimension holds n/5 +- 1 customers
    Seq[((Long, Long, Long, Long, Long, Long)) => Long](_._1, _._2, _._3)
      .foreach { dim =>
        val per = rows.groupBy(dim).map { case (v, rs) => v -> rs.map(_._4).sum }
        assert(per.keySet == Set(1L, 2L, 3L, 4L, 5L))
        per.values.foreach(c =>
          assert(math.abs(c - nCust / 5) <= 1, s"unbalanced quintile: $per"))
      }
    // total orders across the grid == all orders
    assert(rows.map(_._5).sum ==
      spark.read.parquet(s"$sf0001/orders.parquet").count())
  }

  test("q189 cohort LTV: cum is the prefix fold; age-0 cell covers every cohort") {
    val rows = graft.SparkEntry.queries("q189_cohort_ltv")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"cohort $cohort missing its age-0 cell")
      var run = 0L
      sorted.foreach { case (_, _, _, spend, cum, size, ltv) =>
        run += spend
        assert(cum == run, s"cohort $cohort cum != prefix fold")
        assert(ltv == cum.toDouble / size.toDouble, "single-shape division")
      }
      assert(sorted.map(_._6).distinct.size == 1, "one size per cohort")
    }
    // cohort sizes partition the purchasing customers
    val sizes = rows.groupBy(_._1).map { case (_, rs) => rs.head._6 }.sum
    assert(sizes == spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey").distinct().count())
  }

  test("q192 purchase intervals: histogram == brute-force gap fold") {
    import org.apache.spark.sql.functions._
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey").as("k"),
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("1970-01-01"))).cast("long").as("day"),
        col("o_orderkey").as("ok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = o.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).sliding(2).collect {
        case Array(a, b) => b._2 - a._2 }
    }.toSeq
    val want = gaps.groupBy(g => g / 30).map { case (b, gs) =>
      (b, gs.size.toLong, gs.sum) }.toSeq.sortBy(_._1)
    val rows = graft.SparkEntry
      .queries("q192_purchase_intervals")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val (all, buckets) = rows.partition(_._1 == -1L)
    assert(buckets.map(r => (r._1, r._2, r._3)).toSeq == want)
    assert(all.length == 1)
    assert(all.head._2 == gaps.size.toLong && all.head._3 == gaps.sum)
    rows.foreach { case (_, n, sum, mean) =>
      assert(mean == sum.toDouble / n.toDouble, "single-shape division") }
  }
}
