package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Reusable AsOf.joinAsOf semantics: at-or-before matching, inclusive
  * equality, null before any state, per-key isolation — and agreement
  * with the oracle-verified q22 on real data. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("basic at-or-before carry-forward with per-key isolation") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 50.0)).toDF("key", "t", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "a"), // -> 100.0
      (1L, ts("2024-01-01 11:00:00"), "b"), // equal ts -> inclusive 110.0
      (2L, ts("2024-01-01 10:00:00"), "c"), // before any quote -> null
      (2L, ts("2024-01-01 12:00:00"), "d")) // -> 50.0
      .toDF("key", "t", "trade")
    val out = AsOf.joinAsOf(quotes, trades, "key", "t", Seq("price"))
      .select(col("trade"), col("price_asof")).as[(String, Option[Double])]
      .collect().toMap
    assert(out == Map("a" -> Some(100.0), "b" -> Some(110.0), "c" -> None, "d" -> Some(50.0)))
  }

  test("agrees with the oracle-verified q22 on the events table") {
    val e = graft.Tables.events(spark, sf0001)
    val signups = e.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val viaOperator = AsOf.joinAsOf(signups, purchases, "user_id", "ts", Seq("signup_ts"))
      .select(col("event_id"), col("signup_ts_asof"))
      .as[(Long, Option[Timestamp])].collect().toMap
    val viaQuery = graft.SparkEntry.queries("q22_asof_join")(spark, sf0001)
      .select(col("event_id"), col("signup_ts"))
      .as[(Long, Option[Timestamp])].collect().toMap
    assert(viaOperator == viaQuery)
  }
}
