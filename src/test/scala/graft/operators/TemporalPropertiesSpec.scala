package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

import java.sql.Timestamp

/** Property coverage for the round-7 temporal/integrity operators:
  * SCD2's tiling/conservation laws on random event streams, and the
  * checksum's content-addressing law (equal content <=> equal digests)
  * on randomly perturbed tables.
  */
class TemporalPropertiesSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val rnd = new scala.util.Random(20260813L)

  test("SCD2 laws hold on random event streams") {
    val genStream = for {
      nUsers <- Gen.chooseNum(1, 8)
      nEvents <- Gen.chooseNum(1, 120)
    } yield (0 until nEvents).map { i =>
      (rnd.nextInt(nUsers).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(1000000) * 997L),
        i.toLong, // unique event_id = total-order tiebreak
        s"T${rnd.nextInt(4)}")
    }
    (1 to 8).foreach { iter =>
      val events = Iterator.continually(genStream.sample).flatten.next()
      val out = TemporalQueries.scd2History(
        events.toDF("user_id", "ts", "event_id", "event_type")).collect()
      // conservation: every event lands in exactly one segment
      assert(out.map(_.getLong(6)).sum == events.size, s"iter $iter")
      out.groupBy(_.getLong(0)).foreach { case (u, segs) =>
        // one open row, at the end
        assert(segs.count(_.getBoolean(4)) == 1, s"iter $iter user $u")
        assert(segs.last.getBoolean(4))
        segs.sliding(2).foreach {
          case Array(a, b) =>
            // tiling + type alternation + ordering
            assert(a.getTimestamp(3) == b.getTimestamp(2), s"iter $iter user $u")
            assert(a.getString(1) != b.getString(1), s"iter $iter user $u")
            assert(!a.getTimestamp(2).after(b.getTimestamp(2)))
          case _ =>
        }
        // last_seen never leaves its interval
        segs.foreach { sg =>
          assert(!sg.getTimestamp(5).before(sg.getTimestamp(2)))
          Option(sg.getTimestamp(3)).foreach(vt =>
            assert(sg.getTimestamp(5).before(vt)))
        }
      }
    }
  }

  test("checksum content-addressing: digests agree iff bucket content agrees") {
    val d0 = java.sql.Date.valueOf("2024-03-01")
    def table(rows: Seq[(Long, Long, String, java.sql.Date)]) =
      ExtendedQueries.tableChecksum(
        rows.toDF("k", "v", "s", "d"), col("k"), buckets = 16)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    (1 to 5).foreach { iter =>
      val n = 50 + rnd.nextInt(150)
      val rows = (0 until n).map(i =>
        (i.toLong, rnd.nextLong(1000000L), s"s${rnd.nextInt(50)}", d0))
      val a = table(rows)
      // same content, different order/layout -> identical map
      assert(a == table(rnd.shuffle(rows)), s"iter $iter: order dependence")
      // mutate k random rows -> exactly those buckets differ
      val idx = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(n)).distinct
      val mutated = idx.foldLeft(rows) { (acc, i) =>
        acc.updated(i, acc(i).copy(_2 = acc(i)._2 + 1000001L)) }
      val b = table(mutated)
      val expectDirty = idx.map(i => rows(i)._1 % 16).toSet
      val dirty = a.keySet.filter(k => a(k) != b(k))
      assert(dirty == expectDirty, s"iter $iter: $dirty != $expectDirty")
    }
  }

  test("q103 sessionization laws on random streams") {
    (1 to 5).foreach { iter =>
      val gap = 1000L // seconds
      val events = (0 until 200).map { i =>
        (rnd.nextInt(5).toLong,
          new Timestamp(1700000000000L + rnd.nextInt(500) * 600000L),
          i.toLong)
      }
      val out = TemporalQueries.sessionize(
        events.toDF("user_id", "ts", "event_id"), gapSec = gap).collect()
      // partition law: session event counts sum to the input size
      assert(out.map(_.getLong(4)).sum == events.size, s"iter $iter")
      out.groupBy(_.getLong(0)).foreach { case (u, ss) =>
        val sorted = ss.sortBy(_.getLong(1))
        // session numbers are 1..k dense
        assert(sorted.map(_.getLong(1)).toSeq == (1L to ss.length).toSeq)
        sorted.foreach { sg =>
          // duration = end - start and is non-negative
          val span = sg.getTimestamp(3).getTime / 1000 -
            sg.getTimestamp(2).getTime / 1000
          assert(sg.getLong(5) == span && span >= 0, s"iter $iter user $u")
        }
        // consecutive sessions are separated by more than the gap
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b.getTimestamp(2).getTime / 1000 -
              a.getTimestamp(3).getTime / 1000 > gap, s"iter $iter user $u")
          case _ =>
        }
      }
    }
  }

  test("q104 OLS matches an exact BigInt reference on random data") {
    (1 to 5).foreach { iter =>
      val t0 = 1700000000L
      val rows = (0 until 100).map { i =>
        ("t" + rnd.nextInt(3),
          new Timestamp((t0 + rnd.nextInt(100000)) * 1000L),
          rnd.nextInt(49000).toDouble / 100.0)
      }
      val out = TemporalQueries.trendOls(
        rows.toDF("event_type", "ts", "value")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      rows.groupBy(_._1).foreach { case (ty, rs) =>
        val xmin = rs.map(_._2.getTime / 1000).min
        val xs = rs.map(_._2.getTime / 1000 - xmin).map(BigInt(_))
        val ys = rs.map(r => BigInt(math.round(r._3 * 100)))
        val n = BigInt(rs.size)
        val (sx, sy) = (xs.sum, ys.sum)
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val sxx = xs.map(a => a * a).sum
        val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
        val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
        val (on, os, oi) = out(ty)
        assert(on == rs.size && os == slope && oi == intercept,
          s"iter $iter type $ty")
      }
    }
  }

  test("q104 recovers an exact planted line") {
    val t0 = 1700000000L
    // y_cents = 2x + 5 exactly: value = (2x+5)/100 dollars
    val rows = Seq(0L, 1L, 2L, 3L).map(x =>
      ("a", new Timestamp((t0 + x) * 1000L), (2 * x + 5).toDouble / 100.0))
    val out = TemporalQueries.trendOls(
      rows.toDF("event_type", "ts", "value")).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(2) == 2.0 && out(0).getDouble(3) == 5.0)
  }

  test("q105 markov: counts conserve transitions, rows normalize to 1") {
    // user 1: A B A B -> AB, BA, AB ; user 2: A A -> AA
    val rows = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "A"), (1L, 40L, "B"),
      (2L, 10L, "A"), (2L, 20L, "A"))
      .zipWithIndex.map { case ((u, s, t), i) =>
        (u, new Timestamp(1700000000000L + s * 1000), i.toLong, t) }
    val out = TemporalQueries.markovTransitions(
      rows.toDF("user_id", "ts", "event_id", "event_type")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("A", "B")) == ((2L, 3L, 2.0 / 3.0)))
    assert(out(("A", "A")) == ((1L, 3L, 1.0 / 3.0)))
    assert(out(("B", "A")) == ((1L, 1L, 1.0)))
    assert(out.size == 3)
    // cross-user boundaries contribute nothing: 6 events, 2 users -> 4 transitions
    assert(out.values.map(_._1).sum == 4L)
  }

  test("q109 sweep-line: hand profile, conservation, non-negativity") {
    def ev(u: Long, sec: Long, id: Long) =
      (u, new Timestamp(1700000000000L + sec * 1000L), id)
    // gap 15 s -> sessions: u1 [0,10], u2 [5,20], u3 [30,40]
    val rows = Seq(ev(1, 0, 1), ev(1, 10, 2), ev(2, 5, 3), ev(2, 20, 4),
      ev(3, 30, 5), ev(3, 40, 6))
    val out = TemporalQueries.concurrencyProfile(
      rows.toDF("user_id", "ts", "event_id"), gapSec = 15L).collect()
      .map(r => (r.getLong(0) - 1700000000L, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L, 1L), (5L, 1L, 2L), (11L, -1L, 1L),
      (21L, -1L, 0L), (30L, 1L, 1L), (41L, -1L, 0L)), out.toSeq.toString)
    // real corpus: deltas conserve (end at 0), concurrency never negative
    val corpus = TemporalQueries.concurrencyProfile(
      graft.Tables.events(spark, sf0001), gapSec = 43200L).collect()
    assert(corpus.last.getLong(2) == 0L, "every session eventually closes")
    assert(corpus.forall(_.getLong(2) >= 0L))
    assert(corpus.map(_.getLong(1)).sum == 0L, "deltas conserve")
  }

  test("q112 rate audit: trailing frame counts peers; only violators emit") {
    def ev(u: Long, sec: Long, id: Long) =
      (u, new Timestamp(1700000000000L + sec * 1000L), id)
    // window 100 s, max 2: u1 bursts 5 events in 50 s (flags at the
    // 3rd, 4th, 5th), two of them in the SAME second (peers count);
    // u2 spaces events 200 s apart (never flags)
    val rows = Seq(ev(1, 0, 1), ev(1, 10, 2), ev(1, 10, 3), ev(1, 30, 4),
      ev(1, 50, 5), ev(2, 0, 6), ev(2, 200, 7), ev(2, 400, 8))
    val out = TemporalQueries.rateLimitAudit(
      rows.toDF("user_id", "ts", "event_id"), windowSec = 100L,
      maxEvents = 2L).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    // RANGE peers: both :10 events see each other -> n=3 at both
    assert(out.toSeq == Seq((2L, 3L), (3L, 3L), (4L, 4L), (5L, 5L)),
      out.toSeq.toString)
  }

  test("q118 trigram patterns: hand counts, user isolation, rank order") {
    def ev(u: Long, s: Long, ty: String, id: Long) =
      (u, new Timestamp(1700000000000L + s * 1000L), id, ty)
    // u1: A B A B A -> ABA, BAB, ABA; u2: C C C -> CCC (no cross-user)
    val rows = Seq(ev(1, 0, "A", 1), ev(1, 1, "B", 2), ev(1, 2, "A", 3),
      ev(1, 3, "B", 4), ev(1, 4, "A", 5),
      ev(2, 0, "C", 6), ev(2, 1, "C", 7), ev(2, 2, "C", 8))
    val out = TemporalQueries.sequencePatterns(
      rows.toDF("user_id", "ts", "event_id", "event_type"), k = 20)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(5)))
    assert(out.toSeq == Seq(("A", "B", "A", 2L, 1L),
      ("B", "A", "B", 1L, 2L), ("C", "C", "C", 1L, 3L)), out.toSeq.toString)
  }

  test("q120 DAU/WAU laws: window membership and stickiness bounds") {
    def ev(u: Long, day: Long, id: Long) =
      (u, new Timestamp(day * 86400000L + 3600000L), id)
    // u1 active days 0 and 7 (outside each other's 7-day windows);
    // u2 active days 0 and 5 (inside)
    val rows = Seq(ev(1, 0, 1), ev(1, 7, 2), ev(2, 0, 3), ev(2, 5, 4))
    val out = TemporalQueries.rollingActiveUsers(
      rows.toDF("user_id", "ts", "event_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(0L) == ((2L, 2L, 1.0)))
    // day 5: only u2 active today; u1's day-0 visit still in window
    assert(out(5L) == ((1L, 2L, 0.5)))
    // day 7: u1 active; u2's day-5 visit in window; day-0 visits aged out
    assert(out(7L) == ((1L, 2L, 0.5)))
    // corpus: DAU <= WAU always, stickiness in (0, 1]
    TemporalQueries.rollingActiveUsers(graft.Tables.events(spark, sf0001))
      .collect().foreach { r =>
        assert(r.getLong(1) <= r.getLong(2))
        assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0) }
  }

  test("q117 cumulative uniques: first-occurrence accounting laws") {
    def ev(u: Long, day: Long, id: Long) =
      (u, new Timestamp(day * 86400000L), id)
    // day 0: users 1,2; day 1: user 1 again (NOT new) + user 3; day 3: user 2
    val rows = Seq(ev(1, 0, 1), ev(2, 0, 2), ev(1, 1, 3), ev(3, 1, 4),
      ev(2, 3, 5))
    val out = TemporalQueries.cumulativeUniques(
      rows.toDF("user_id", "ts", "event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L, 2L), (1L, 1L, 3L), (3L, 0L, 3L)),
      out.toSeq.toString)
    // corpus: monotone, ends at the distinct-user count
    val corpus = TemporalQueries.cumulativeUniques(
      graft.Tables.events(spark, sf0001)).collect()
    assert(corpus.map(_.getLong(2)).toSeq ==
      corpus.map(_.getLong(2)).sorted.toSeq, "monotone growth")
    assert(corpus.last.getLong(2) ==
      graft.Tables.events(spark, sf0001).select("user_id").distinct().count())
  }

  test("q114 conversion latency: hand gaps, nearest-rank p90 law") {
    def ev(u: Long, sec: Long, ty: String, id: Long) =
      (u, new Timestamp(1700000000000L + sec * 1000L), id, ty)
    // 10 users convert view->click with gaps 10,20,...,100 s;
    // nearest-rank p90 at rank (9*10+9)//10 = 9 -> 90 s; median 55.0
    val rows = (1 to 10).flatMap { u =>
      Seq(ev(u, 0, "view", u * 10L), ev(u, u * 10L, "click", u * 10L + 1))
    }
    val out = TemporalQueries.conversionLatency(
      rows.toDF("user_id", "ts", "event_id", "event_type")).collect()
    assert(out.length == 1, "no purchases -> only view_to_click")
    val r = out(0)
    assert(r.getString(0) == "view_to_click" && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 55.0 && r.getLong(3) == 90L)
    assert(r.getLong(4) == 10L && r.getLong(5) == 100L)
  }

  test("q111 dyadic decay: exact hand values, cap, and rank order") {
    def ev(u: Long, day: Long, id: Long) =
      (u, new Timestamp(1700006400000L + day * 86400000L), id)
    // corpus max day = day 60. u1: one event at day 60 (age 0) + one at
    // day 59 (age 1); u2: one at day 0 (age 60 -> capped 50)
    val rows = Seq(ev(1, 60, 1), ev(1, 59, 2), ev(2, 0, 3))
    val out = TemporalQueries.decayedActivity(
      rows.toDF("user_id", "ts", "event_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(out(1L)._1 == (1L << 50) + (1L << 49), "2^-0 + 2^-1 in units")
    assert(out(1L)._2 == 1.5)
    assert(out(2L)._1 == 1L, "age caps at 50 -> one unit")
    assert(out(1L)._3 == 1L && out(2L)._3 == 2L)
  }

  test("q170 markov attribution: exact hand values on an acyclic chain") {
    // Acyclic journeys -> the 12-round integer fixed point is EXACT
    // (each state's value settles after path-length rounds, no
    // geometric tail), so the expected integers are hand-derivable:
    //   u1: click -> purchase            START -> click -> CONV
    //       (plus a post-purchase view and a SECOND purchase that the
    //        first-conversion truncation must drop)
    //   u2: click -> (no purchase)       START -> click -> NULLSTATE
    //   u3: view  -> purchase            START -> view  -> CONV
    //   u4: view  -> purchase            START -> view  -> CONV
    // counts: START->click 2, START->view 2 (tot 4);
    //         click->CONV 1, click->NULL 1 (tot 2); view->CONV 2 (tot 2)
    // p(click)=S/2, p(view)=S, p(START)=(2*S/2 + 2*S)/4 = 3S/4
    // remove click: p(START)=(0 + 2*S)/4 = S/2   -> effect S/4
    // remove view:  p(START)=(2*S/2 + 0)/4 = S/4 -> effect S/2
    def ev(id: Long, u: Long, m: Int, typ: String) =
      (id, new Timestamp(1700006400000L + m * 60000L), u, typ)
    val rows = Seq(
      ev(1, 1, 0, "click"), ev(2, 1, 1, "purchase"),
      ev(3, 1, 2, "view"), ev(4, 1, 3, "purchase"),
      ev(5, 2, 0, "click"),
      ev(6, 3, 0, "view"), ev(7, 3, 1, "purchase"),
      ev(8, 4, 0, "view"), ev(9, 4, 1, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val s = 1000000000000L
    val got = TemporalQueries
      .markovAttribution(rows, Seq("click", "view"), iters = 12)
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(
      ("click", 3 * s / 4, s / 2, s / 4),
      ("view", 3 * s / 4, s / 4, s / 2)), s"$got")
  }

  test("q172 shapley: exact hand values, truncation, efficiency law") {
    // n=2 channels {click, view} -> units are 1/2! = halves.
    //   u1: click -> purchase -> view (post-purchase view MUST be
    //       dropped by the first-conversion truncation) -> mask {c}
    //   u2: view -> purchase                            -> mask {v}
    //   u3: click -> view -> purchase                   -> mask {c,v}
    //   u4: purchase only                               -> mask {}
    //   u5: click, never purchases -> NOT a converter, excluded
    // v({})=1, v({c})=2, v({v})=2, v(N)=4
    // phi_c*2 = 1*(v({c})-v({})) + 1*(v(N)-v({v})) = 1 + 2 = 3
    // phi_v*2 = 1*(v({v})-v({})) + 1*(v(N)-v({c})) = 1 + 2 = 3
    // efficiency: 3 + 3 = 2!*(v(N)-v({})) = 2*3
    def ev(id: Long, u: Long, m: Int, typ: String) =
      (id, new Timestamp(1700006400000L + m * 60000L), u, typ)
    val rows = Seq(
      ev(1, 1, 0, "click"), ev(2, 1, 1, "purchase"), ev(3, 1, 2, "view"),
      ev(4, 2, 0, "view"), ev(5, 2, 1, "purchase"),
      ev(6, 3, 0, "click"), ev(7, 3, 1, "view"), ev(8, 3, 2, "purchase"),
      ev(9, 4, 0, "purchase"),
      ev(10, 5, 0, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TemporalQueries
      .shapleyAttribution(rows, Seq("click", "view"))
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(
      ("click", 3L, 2L, 4L),
      ("view", 3L, 2L, 4L)), s"$got")
    assert(got.map(_._2).sum == 2L * (4L - 1L), "efficiency law")
  }

  test("q173 seasonal decomposition: planted season recovered exactly") {
    // 36 gapless months, level 100 units + planted moy effect
    // (+12 units in Dec, -12 in Jun, 0 elsewhere): the 2x12 MA of a
    // constant-plus-balanced-season series is flat, so the seasonal
    // index must recover the planted effect exactly (in 24ths of a
    // cent: 1 unit below = $1 = 100 cents).
    val rows = (0 until 36).map { i =>
      val moy = i % 12 + 1
      val eff = if (moy == 12) 12L else if (moy == 6) -12L else 0L
      (java.sql.Timestamp.valueOf(f"${1992 + i / 12}%d-$moy%02d-15 00:00:00"),
        (100L + eff).toDouble)
    }
    val df = rows.toDF("o_orderdate", "o_totalprice")
    val out = TemporalQueries.seasonalDecomposition(df)
      .as[(Int, Long, Long, Long, Long)].collect().toList
    assert(out.map(_._1) == (1 to 12).toList)
    // 24 usable detrended months (rows 7..30 of 36)
    assert(out.map(_._2).sum == 36 - 12)
    val idx = out.map(o => o._1 -> o._3).toMap
    // planted effect in 24ths of a cent: eff * 100 cents * 24
    assert(idx(12) == 12L * 100 * 24, s"dec=${idx(12)}")
    assert(idx(6) == -12L * 100 * 24, s"jun=${idx(6)}")
    assert((1 to 12).filterNot(m => m == 6 || m == 12)
      .forall(m => idx(m) == 0L), s"$idx")
    // constant+balanced season => zero residuals everywhere
    assert(out.forall(o => o._4 == 0L && o._5 == 0L), s"$out")
    // the DIV-truncation parity the seasonal index relies on
    assert(spark.sql("SELECT -7 div 2").head().getLong(0) == -3L)
    // the month spine the ROWS window requires is gapless at sf0.001
    val months = graft.Tables.orders(spark, sf0001)
      .select(date_trunc("month", col("o_orderdate")).as("m"))
      .distinct().orderBy("m")
      .as[java.sql.Timestamp].collect()
    months.sliding(2).foreach { case Array(a, b) =>
      val cal = java.util.Calendar.getInstance(
        java.util.TimeZone.getTimeZone("UTC"))
      cal.setTimeInMillis(a.getTime); cal.add(java.util.Calendar.MONTH, 1)
      assert(cal.getTimeInMillis == b.getTime, s"gap after $a")
    case _ => }
  }

  test("q174 cusum: prefix-extremum identity equals the literal recursion") {
    // random per-day counts for one synthetic type; compare the
    // windowed identity against Page's recursion computed by hand
    (1 to 6).foreach { iter =>
      val n = 5 + rnd.nextInt(40)
      val counts = (0 until n).map(_ => 1L + rnd.nextInt(20))
      val day0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
      val rows = counts.zipWithIndex.flatMap { case (c, i) =>
        (0 until c.toInt).map { j =>
          (i.toLong * 100 + j,
            new java.sql.Timestamp(day0 + i.toLong * 86400000L),
            1L, "drift", 0.0, "{}")
        }
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type",
        "value", "props")
      val out = TemporalQueries.cusumChangepoint(df).collect()
      assert(out.length == 1)
      val r = out.head
      val total = counts.sum
      val k = 1000000L * total / n
      // literal Page recursion
      var su = 0L; var sd = 0L; var maxUp = 0L; var maxDown = 0L
      counts.foreach { c =>
        val dev = 1000000L * c - k
        su = math.max(0L, su + dev); sd = math.max(0L, sd - dev)
        maxUp = math.max(maxUp, su); maxDown = math.max(maxDown, sd)
      }
      assert(r.getAs[Long]("n_days") == n.toLong, s"iter $iter")
      assert(r.getAs[Long]("k_micro") == k, s"iter $iter")
      assert(r.getAs[Long]("max_up_micro") == maxUp, s"iter $iter")
      assert(r.getAs[Long]("max_down_micro") == maxDown, s"iter $iter")
    }
  }

  test("q175 acf: BigInt brute-force reference and planted period") {
    // planted period-2 series => strongly negative acf at odd lags,
    // positive at even lags; check exact num/den vs BigInt reference
    val counts = (0 until 40).map(i => if (i % 2 == 0) 9L else 3L)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      (0 until c.toInt).map { _ =>
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
          i.toLong * 86400000L, 1.0)
      }
    }.map { case (ms, p) => (new java.sql.Timestamp(ms), p) }
    val df = rows.toDF("o_orderdate", "o_totalprice")
    val out = TemporalQueries.autocorrelation(df, maxLag = 4)
      .as[(Int, Long, Long, Long, Double)].collect().toList
    // BigInt reference on the same counts
    val n = BigInt(40); val sx = BigInt(counts.sum)
    val c = counts.map(x => n * x - sx)
    val den = c.map(v => v * v).sum
    (1 to 4).foreach { k =>
      val num = (0 until 40 - k).map(i => c(i) * c(i + k)).sum
      val row = out(k - 1)
      assert(row._1 == k)
      assert(row._2 == 40L - k, s"n_pairs lag $k")
      assert(BigInt(row._3) == num, s"num lag $k")
      assert(BigInt(row._4) == den, s"den lag $k")
      assert(row._5 == num.toDouble / den.toDouble ||
        math.abs(row._5 - (BigDecimal(num) / BigDecimal(den)).toDouble)
          < 1e-15, s"acf lag $k")
    }
    assert(out(0)._5 < 0 && out(1)._5 > 0, "planted period-2 signs")
  }
}
