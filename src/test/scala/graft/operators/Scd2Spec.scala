package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Semantic anchor for the q80 SCD2 history build: intervals must tile
  * each user's timeline with no overlap, no gap, one open row, and no
  * zero-length change (consecutive segments always differ in type).
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("known stream collapses to the hand-built interval set") {
    val events = Seq(
      // user 1: A A B A  -> [A@0, B@3), [B@3, A@4), [A@4, open)
      (1L, ts(0), 10L, "A"), (1L, ts(1), 11L, "A"),
      (1L, ts(3), 12L, "B"), (1L, ts(4), 13L, "A"),
      // user 2: single event -> one open interval
      (2L, ts(5), 14L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TemporalQueries.scd2History(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, "A", ts(0), Some(ts(3)), false, 2L),
      (1L, "B", ts(3), Some(ts(4)), false, 1L),
      (1L, "A", ts(4), None, true, 1L),
      (2L, "C", ts(5), None, true, 1L)))
  }

  test("same-timestamp events break ties by event_id deterministically") {
    val events = Seq(
      (1L, ts(0), 2L, "B"), (1L, ts(0), 1L, "A"), (1L, ts(1), 3L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TemporalQueries.scd2History(events).collect()
    // order is A (id 1) then B (id 2) then A: three segments
    assert(out.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    assert(out.map(_.getLong(6)).sum == 3L)
  }

  test("real events: intervals tile, types alternate, counts conserve") {
    val ev = graft.Tables.events(spark, sf001)
    val out = TemporalQueries.scd2History(ev).collect()
    assert(out.map(_.getLong(6)).sum == ev.count(), "n_events conserves rows")
    out.groupBy(_.getLong(0)).foreach { case (u, segs) =>
      // exactly one open (is_current) segment per user, and it is last
      assert(segs.count(_.getBoolean(4)) == 1, s"user $u open rows")
      assert(segs.last.getBoolean(4) && segs.last.getTimestamp(3) == null)
      segs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(3) == b.getTimestamp(2),
            s"user $u: valid_to tiles with next valid_from")
          assert(a.getString(1) != b.getString(1),
            s"user $u: consecutive segments changed type")
        case _ =>
      }
    }
  }
}
