package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** q128 l-diversity + q129 last-touch attribution: synthetic semantic
  * anchors beyond the DuckDB hash gate. */
class PrivacyAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
  private def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")

  test("q128: homogeneous and near-homogeneous groups emit; diverse ones don't") {
    val rows = Seq(
      // group (1, 0): 3 members, ALL segment A -> n_sensitive 1, share 1.0
      (1, 0L, "A"), (1, 0L, "A"), (1, 0L, "A"),
      // group (2, 0): 4 members, 2 distinct, dominant 3/4
      (2, 0L, "A"), (2, 0L, "A"), (2, 0L, "A"), (2, 0L, "B"),
      // group (3, 0): 3 members, 3 distinct -> l-diverse at l=3, no emit
      (3, 0L, "A"), (3, 0L, "B"), (3, 0L, "C"))
      .toDF("nationkey", "bal_bucket", "sensitive")
    val got = ExtendedQueries.lDiversityAudit(rows, l = 3L)
      .select("nationkey", "group_size", "n_sensitive", "top_cnt", "top_share")
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, 3L, 1L, 3L, 1.0), (2, 4L, 2L, 3L, 0.75)),
      s"${got.toSeq}")
  }

  test("q158: TVD is exact-rational and absent sensitive values contribute their full mass") {
    // global distribution: A=4, B=2 over N=6
    // group (1,0) = [A,A]        -> TVD = (|1-2/3| + |0-1/3|)/2 = 1/3
    //   (B is ABSENT from the group — the densified broadcast must
    //    still charge it |0*6 - 2*2| = 4)
    // group (2,0) = [A,B,A,B]    -> TVD = (|1/2-2/3| + |1/2-1/3|)/2 = 1/6
    val rows = Seq(
      (1, 0L, "A"), (1, 0L, "A"),
      (2, 0L, "A"), (2, 0L, "B"), (2, 0L, "A"), (2, 0L, "B"))
      .toDF("nationkey", "bal_bucket", "seg")
    val got = ExtendedQueries.tClosenessAudit(rows)
      .as[(Int, Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    // tvd_num g1: |2*6-4*2| + |0*6-2*2| = 4+4 = 8, den 2*2*6 = 24
    // tvd_num g2: |2*6-4*4| + |2*6-2*4| = 4+4 = 8, den 2*4*6 = 48
    assert(got == List(
      (1, 0L, 2L, 8L, 8.0 / 24.0),
      (2, 0L, 4L, 8L, 8.0 / 48.0)), s"$got")
  }

  test("q129: latest in-window touch wins; ties break by event_id; no touch -> nulls") {
    val ev = Seq(
      // user 1: view at 10:00, click at 10:30, purchase 11:00 -> click
      (1L, t(10, 0), 1L, "view"), (2L, t(10, 30), 1L, "click"),
      (3L, t(11, 0), 1L, "purchase"),
      // user 2: two touches at the SAME ts -> max event_id (the click) wins
      (4L, t(9, 0), 2L, "view"), (5L, t(9, 0), 2L, "click"),
      (6L, t(9, 5), 2L, "purchase"),
      // user 3: touch AFTER the purchase only -> unattributed
      (7L, t(12, 0), 3L, "purchase"), (8L, t(13, 0), 3L, "view"),
      // user 4: touch outside the 7-day window -> unattributed
      (9L, day(1), 4L, "click"), (10L, day(9), 4L, "purchase"),
      // user 5: same-instant touch and purchase -> inclusive at-or-before
      (11L, t(15, 0), 5L, "view"), (12L, t(15, 0), 5L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TemporalQueries.lastTouchAttribution(ev, windowSec = 604800L)
      .select("event_id", "touch_type", "touch_id", "gap_sec")
      .as[(Long, Option[String], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(3L) == ((Some("click"), Some(2L), Some(1800L))), s"${got(3L)}")
    assert(got(6L) == ((Some("click"), Some(5L), Some(300L))), s"${got(6L)}")
    assert(got(7L) == ((None, None, None)), s"${got(7L)}")
    assert(got(10L) == ((None, None, None)), s"${got(10L)}")
    assert(got(12L) == ((Some("view"), Some(11L), Some(0L))), s"${got(12L)}")
    assert(got.size == 5, "exactly one output row per purchase")
  }

  test("q130: linear credit splits equally over in-window touches and sums to 1") {
    val ev = Seq(
      // user 1: 3 views + 1 click before the purchase -> credits 3/4, 1/4
      (1L, t(9, 0), 1L, "view"), (2L, t(9, 10), 1L, "view"),
      (3L, t(9, 20), 1L, "view"), (4L, t(9, 30), 1L, "click"),
      (5L, t(10, 0), 1L, "purchase"),
      // user 2: the only touch is outside the window -> no rows at all
      (6L, day(1), 2L, "click"), (7L, day(9), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TemporalQueries.linearAttribution(ev, windowSec = 604800L)
      .select("event_id", "touch_type", "c", "n", "credit")
      .as[(Long, String, Long, Long, Double)].collect()
    assert(got.forall(_._1 == 5L), s"only the attributed purchase emits: ${got.toSeq}")
    val byType = got.map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(byType("view") == ((3L, 4L, 0.75)) && byType("click") == ((1L, 4L, 0.25)),
      s"$byType")
    assert(got.map(_._5).sum == 1.0, "per-purchase credits must sum to 1")
  }

  test("q146: the golden record's last-wins field follows the (ts, event_id) total order") {
    val ev = Seq(
      // same-timestamp pair: event_id 3 must win over 2
      (1L, t(9, 0), 1L, "view", 1.0),
      (2L, t(10, 0), 1L, "click", 2.0),
      (3L, t(10, 0), 1L, "purchase", 3.0),
      (4L, t(8, 0), 2L, "error", 0.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TemporalQueries.goldenRecord(ev)
      .select("user_id", "first_seen", "last_seen", "n_events", "n_types",
        "value_cents", "last_type", "last_event_id")
      .as[(Long, Timestamp, Timestamp, Long, Long, Long, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, t(9, 0), t(10, 0), 3L, 3L, 600L, "purchase", 3L)),
      s"${got(1L)}")
    assert(got(2L) == ((2L, t(8, 0), t(8, 0), 1L, 1L, 50L, "error", 4L)),
      s"${got(2L)}")
  }

  test("q147: disorder is zero for in-order streams and exact for a known inversion") {
    val ev = Seq(
      // type A arrives in order -> zero disorder
      (1L, t(9, 0), 1L, "A", 0.0), (2L, t(10, 0), 1L, "A", 0.0),
      // type B: the second ARRIVAL (higher event_id) carries an EARLIER
      // ts, 2h behind the running max -> late at a 1h watermark
      (3L, t(12, 0), 2L, "B", 0.0), (4L, t(10, 0), 2L, "B", 0.0),
      (5L, t(12, 30), 2L, "B", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TemporalQueries.disorderAudit(
      ev.select("event_type", "event_id", "ts"), watermarkSec = 3600L)
      .select("event_type", "n", "max_disorder_sec", "n_late", "late_frac")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 2L, 0L, 0L, 0.0)), s"${got("A")}")
    assert(got("B") == (("B", 3L, 7200L, 1L, 1.0 / 3)), s"${got("B")}")
  }

  test("q140: Kaplan-Meier matches the hand-computed curve with censoring") {
    def ts(s: String) = Timestamp.valueOf(s)
    // A: event day 1; B: censored day 1 (horizon - signup = 1.5d);
    // C: event day 2; D: censored day 3. Horizon = unrelated view 01-10.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (2L, ts("2024-01-02 00:00:00"), 1L, "purchase"),
      (3L, ts("2024-01-01 00:00:00"), 2L, "signup"),
      (4L, ts("2024-01-03 00:00:00"), 2L, "purchase"),
      (5L, ts("2024-01-08 12:00:00"), 3L, "signup"),
      (6L, ts("2024-01-07 00:00:00"), 4L, "signup"),
      (7L, ts("2024-01-10 00:00:00"), 99L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TemporalQueries.kaplanMeier(ev)
      .select("t_day", "n_risk", "n_event", "n_censor", "survival")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 4L, 1L, 1L, 0.75),
      (2L, 2L, 1L, 0L, 0.375),
      (3L, 1L, 0L, 1L, 0.375)), s"${got.toSeq}")
    // survival is nonincreasing on the real corpus too
    val real = TemporalQueries.kaplanMeier(graft.Tables.events(spark, sf0001))
      .select("t_day", "survival").as[(Long, Double)].collect().sortBy(_._1)
    real.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 + 1e-15, s"survival must be nonincreasing: $a -> $b")
    }
  }

  test("q131: gini is 0 for equal values and (n-1)/n for a single whale") {
    val customers = (1L to 10L).map(k => (k, 7)).toDF("c_custkey", "c_nationkey")
    def ordersOf(vals: Seq[(Long, Double)]) =
      vals.zipWithIndex.map { case ((ck, v), i) =>
        (i.toLong, ck, v)
      }.toDF("o_orderkey", "o_custkey", "o_totalprice")
    // equal spend -> gini exactly 0
    val eq = ExtendedQueries.giniConcentration(customers,
      ordersOf((1L to 10L).map(k => (k, 100.0))))
      .select("gini").as[Double].collect()
    assert(eq.toSeq == Seq(0.0), s"${eq.toSeq}")
    // one whale, nine zero-order customers -> gini = (n-1)/n = 0.9,
    // and the zero customers MUST be included for that to hold
    val whale = ExtendedQueries.giniConcentration(customers,
      ordersOf(Seq((10L, 500.0))))
      .select("n_customers", "gini").as[(Long, Double)].collect()
    assert(whale.toSeq == Seq((10L, 0.9)), s"${whale.toSeq}")
  }
}
