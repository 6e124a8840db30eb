package graft.operators

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic anchors for q90 (CDC compaction + merge) and q92 (time-grid
  * gap fill with linear interpolation) on planted inputs where the
  * expected output is computable by hand.
  */
class CdcGapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cdc merge: last op wins; D drops, I/U upsert, base passes through") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "payload")
    // key1: U then D (delete wins) — dropped although in base
    // key2: D then U (update wins) — upserted to 2.2
    // key3: untouched base row
    // key9: I only — inserted although NOT in base
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "U", 1.1),
      (1L, ts("2024-01-02 00:00:00"), 2L, "D", 0.0),
      (2L, ts("2024-01-01 00:00:00"), 3L, "D", 0.0),
      (2L, ts("2024-01-02 00:00:00"), 4L, "U", 2.2),
      (9L, ts("2024-01-01 00:00:00"), 5L, "I", 9.9))
      .toDF("user_id", "ts", "event_id", "op", "value")
    val out = TemporalQueries.cdcMerge(base, "k", "payload", log)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getLong(4))).toMap
    assert(out.keySet == Set(2L, 3L, 9L), "key 1 deleted, key 9 inserted")
    assert(out(2L) == (("merged", 2.2, 2L)))
    assert(out(3L) == (("base", 30.0, 0L)))
    assert(out(9L) == (("merged", 9.9, 1L)))
  }

  test("cdc merge: same-ts changes break ties by event_id (total order)") {
    val base = Seq((5L, 50.0)).toDF("k", "payload")
    val t = ts("2024-01-01 00:00:00")
    val log = Seq((5L, t, 7L, "U", 7.7), (5L, t, 9L, "U", 9.9),
      (5L, t, 8L, "U", 8.8)).toDF("user_id", "ts", "event_id", "op", "value")
    val r = TemporalQueries.cdcMerge(base, "k", "payload", log).collect()
    assert(r.length == 1 && r.head.getDouble(2) == 9.9,
      "highest event_id at equal ts is the last change")
  }

  test("gap fill: interior gaps interpolate linearly, edges stay measured") {
    // one series, buckets at :00 (v=10), :45 (v=40) — the two 15-min
    // cells between them must come out 20 and 30 exactly
    val ev = Seq(
      ("a", ts("2024-01-01 00:07:00"), 10.0),
      ("a", ts("2024-01-01 00:52:00"), 40.0))
      .toDF("event_type", "ts", "value")
    val out = TemporalQueries.gapFillInterpolate(ev)
      .collect().map(r => (r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.length == 4, "grid spans exactly [first, last] bucket")
    assert(out(0) == (("2024-01-01 00:00:00.0", 1L, 10.0, false)))
    assert(out(1) == (("2024-01-01 00:15:00.0", 0L, 20.0, true)))
    assert(out(2) == (("2024-01-01 00:30:00.0", 0L, 30.0, true)))
    assert(out(3) == (("2024-01-01 00:45:00.0", 1L, 40.0, false)))
  }

  test("gap fill: measured cells aggregate (count + rounded sum), per type") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:01:00"), 1.25),
      ("a", ts("2024-01-01 00:14:00"), 2.25),
      ("b", ts("2024-01-01 00:01:00"), 7.0))
      .toDF("event_type", "ts", "value")
    val out = TemporalQueries.gapFillInterpolate(ev)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSet == Set(("a", 2L, 3.5), ("b", 1L, 7.0)),
      "one-bucket series have no gaps; sums aggregate within the bucket")
  }

  test("gap fill at sf0.01: every gap cell sits strictly between neighbors' time; measured cells keep their sum") {
    val out = graft.SparkEntry.queries("q92_gap_fill_interpolate")(spark, sf001)
    val interp = out.where(col("is_interpolated"))
    assert(interp.where(col("v_filled").isNull).count() == 0,
      "interior grid always has both neighbors (lo/hi are measured)")
    val n = out.count()
    val dense = out.groupBy("event_type")
      .agg(count(lit(1)).as("cells"),
        ((max(unix_timestamp(col("bucket"))) -
          min(unix_timestamp(col("bucket")))) / 900 + 1).as("expected"))
      .where(col("cells") =!= col("expected")).count()
    assert(dense == 0, "grid is dense per type")
    assert(n > 10000, s"sf0.01 grid should be ~14k cells, got $n")
  }
}
