package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q217 retractable-MAX MV: the two-path refresh identity on the real
  * fixture — BOTH paths must be exercised (clean groups prove the
  * monotone fold, dirty groups prove the retraction trigger), and the
  * incremental result must equal the full re-election on every row. */
class MaxMvSpec extends SparkSpec {
  import spark.implicits._

  test("both refresh paths fire at sf0.001 and the identity holds on every group") {
    val rows = WarehouseQueries.retractableMaxMv(spark, sf0001)
      .select(col("g"), col("dirty"), col("n_feed"), col("max_inc"),
        col("max_full"), col("inc_matches_full"))
      .as[(Long, Boolean, Long, Option[Long], Option[Long], Boolean)]
      .collect()
    assert(rows.length == 10)
    assert(rows.forall(_._6),
      "incremental max diverged from full re-election: " +
        rows.filterNot(_._6).mkString(", "))
    assert(rows.exists(_._2), "fixture exercises no dirty (retraction) group")
    assert(rows.exists(r => !r._2 && r._3 > 0),
      "fixture exercises no clean fold group with feed activity")
    // the audit column is not vacuous: incremental values are present
    // wherever the group is live at v3
    assert(rows.forall(r => r._4.isDefined == r._5.isDefined))
  }

  test("dirty groups are exactly those with a retraction at-or-above the v1 max") {
    // cross-check the marker count against a direct recomputation from
    // the public q160 change feed + the q217 frame itself
    val out = WarehouseQueries.retractableMaxMv(spark, sf0001)
      .select("g", "n_dirty_markers", "dirty")
      .as[(Long, Long, Boolean)].collect()
      .map { case (g, n, d) => g -> ((n, d)) }.toMap
    assert(out.values.forall { case (n, d) => d == (n > 0) })
    // q160's feed is the public surface the delta derives from: every
    // delete/update_preimage row lands in some bucket; buckets with
    // ONLY insert/update_postimage rows can never be dirty
    val feed = graft.SparkEntry.queries("q160_change_data_feed")(
        spark, sf0001)
      .select(pmod(col("c_custkey"), lit(10)).cast("long").as("g"),
        col("change_type"))
      .as[(Long, String)].collect()
    val retractionBuckets = feed
      .filter(r => r._2 == "delete" || r._2 == "update_preimage")
      .map(_._1).toSet
    for ((g, (_, dirty)) <- out if dirty)
      assert(retractionBuckets.contains(g),
        s"group $g dirty without any retraction row in the feed")
  }
}
