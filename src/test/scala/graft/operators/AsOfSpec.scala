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

  test("agrees with an independent brute-force as-of on the events table") {
    // NOT via q22 (q22 itself routes through joinAsOf now): reference
    // answer computed by a structurally different plan — plain range
    // join + max aggregation
    val e = graft.Tables.events(spark, sf0001)
    val signups = e.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val brute = purchases
      .join(signups, col("s_user") === col("user_id") && col("s_ts") <= col("ts"), "left")
      .groupBy("event_id")
      .agg(max(col("s_ts")).as("expected_signup_ts"))
      .as[(Long, Option[Timestamp])].collect().toMap

    val viaOperator = AsOf.joinAsOf(signups.select(col("s_user").as("user_id"), col("s_ts").as("ts"), col("s_ts").as("signup_ts")),
        purchases, "user_id", "ts", Seq("signup_ts"))
      .select(col("event_id"), col("signup_ts_asof"))
      .as[(Long, Option[Timestamp])].collect().toMap
    assert(viaOperator.nonEmpty && viaOperator == brute)
  }

  test("reserved/colliding column names are rejected with a clear error") {
    val state = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("key", "t", "price")
    val probe = Seq((1L, ts("2024-01-01 10:30:00"), "p")).toDF("key", "t", "trade")

    // internal reserved name on an input
    val badState = state.withColumn("__asof_tag", lit(0))
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(badState, probe, "key", "t", Seq("price"))
    }
    // rightCols repeating the key
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(state, probe, "key", "t", Seq("price"), Some(Seq("key", "trade")))
    }
    // carried output '<c>_asof' colliding with a right-side column
    val collidingProbe = probe.withColumn("price_asof", lit(9.0))
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(state, collidingProbe, "key", "t", Seq("price"))
    }
  }

  test("a genuinely NULL latest state value is carried as null, not a stale value") {
    val state = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), Option("x")),
      (1L, ts("2024-01-01 11:00:00"), None, Option("y"))).toDF("key", "t", "price", "tagv")
    val probe = Seq((1L, ts("2024-01-01 11:30:00"), "p1")).toDF("key", "t", "trade")
    val out = AsOf.joinAsOf(state, probe, "key", "t", Seq("price", "tagv"))
      .select(col("price_asof"), col("tagv_asof"))
      .as[(Option[Double], Option[String])].collect().toSeq
    // both carried columns come from the SAME (latest) state row:
    // price null, tagv "y" — not the stale price 100.0
    assert(out == Seq((None, Some("y"))))
  }
}
