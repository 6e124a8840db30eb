package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q210 point-in-time feature snapshot: the leakage contract checked
  * against an independent driver-side replay of the event stream.
  *
  * Reference model (the documented at-or-before rule): the features of
  * a purchase label at time L are the aggregates over ALL of the
  * user's non-purchase events with ts <= L — strictly-later events
  * never leak in, same-instant non-purchase events are included, and
  * last_type is the event type of the (ts, event_id)-max such event.
  */
class FeatureSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(eventId: Long, tsUs: Long, tpe: String, cents: Long)

  private def eventsByUser(): Map[Long, Seq[Ev]] =
    graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"),
        expr("cast(round(value * 100) as bigint)"))
      .as[(Long, Long, Long, String, Long)].collect()
      .groupBy(_._1)
      .map { case (u, rs) =>
        u -> rs.map(r => Ev(r._2, r._3, r._4, r._5)).toSeq
          .sortBy(e => (e.tsUs, e.eventId))
      }

  test("every snapshot row matches the driver-side replay (no leakage)") {
    val out = SparkEntry.queries("q210_feature_snapshot")(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("purchase_cents"), col("n_events_asof"), col("cents_asof"),
        col("n_types_asof"), col("last_type_asof"))
      .collect()
    assert(out.nonEmpty)
    val byUser = eventsByUser()
    var coldStart = 0
    out.foreach { r =>
      val (u, l) = (r.getLong(0), r.getLong(1))
      val prior = byUser(u).filter(e => e.tpe != "purchase" && e.tsUs <= l)
      if (prior.isEmpty) {
        coldStart += 1
        assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6) &&
          r.isNullAt(7), s"user $u at $l: cold-start row must be NULL")
      } else {
        assert(r.getLong(4) == prior.length.toLong,
          s"user $u at $l: n_events_asof")
        assert(r.getLong(5) == prior.map(_.cents).sum,
          s"user $u at $l: cents_asof")
        assert(r.getLong(6) == prior.map(_.tpe).distinct.length.toLong,
          s"user $u at $l: n_types_asof")
        assert(r.getString(7) == prior.last.tpe,
          s"user $u at $l: last_type_asof")
      }
    }
    // label rows are exactly the purchases; replay agrees on the count
    val nPurch = byUser.valuesIterator.map(_.count(_.tpe == "purchase")).sum
    assert(out.length == nPurch)
    assert(coldStart < out.length, "every row cold-start: features never attached")
  }
}
