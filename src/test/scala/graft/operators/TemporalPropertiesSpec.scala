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
}
