package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

/** Stream-stream correlation: the streaming twin of the batch range join
  * (q23) — purchases joined to signups of the same user within 1 hour,
  * both sides watermarked so join state is bounded; plus streaming exact
  * dedup (the streaming face of q33's content dedup).
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String) =
    EventStreams.Event(id, Timestamp.valueOf(t), user, typ, 1.0)

  test("stream-stream interval join: purchases within 1h of signup, state bounded by watermarks") {
    implicit val sq = spark.sqlContext
    val signups = MemoryStream[EventStreams.Event]
    val purchases = MemoryStream[EventStreams.Event]
    val s = signups.toDF().where(col("event_type") === "signup")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
    val p = purchases.toDF().where(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val joined = s.join(p,
      col("p_user") === col("s_user") &&
        col("p_ts") >= col("s_ts") && col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_out").trigger(Trigger.ProcessingTime(0)).start()

    signups.addData(ev(1, "2024-01-01 10:00:00", 7, "signup"))
    purchases.addData(
      ev(2, "2024-01-01 10:30:00", 7, "purchase"), // in window
      ev(3, "2024-01-01 12:30:00", 7, "purchase"), // outside window
      ev(4, "2024-01-01 10:15:00", 8, "purchase")) // other user
    q.processAllAvailable()
    val rows = spark.table("ssjoin_out")
      .select("signup_id", "purchase_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(rows == Set((1L, 2L)))
  }

  test("streaming exact dedup with watermark drops in-window duplicates") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    val deduped = ms.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").trigger(Trigger.ProcessingTime(0)).start()
    ms.addData(
      ev(1, "2024-01-01 10:00:00", 7, "click"),
      ev(2, "2024-01-01 10:05:00", 7, "click"), // duplicate key in window
      ev(3, "2024-01-01 10:10:00", 8, "click"))
    q.processAllAvailable()
    ms.addData(ev(4, "2024-01-01 10:20:00", 7, "click")) // still duplicate
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 3L))
  }
}
