package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic anchor for q85: the GK sketch's rank-error contract
  * checked here against exact DRIVER-SIDE sorted ranks (the catalog
  * row now carries the same audit in-plan and is oracle-checked —
  * round 11 — but this spec keeps the raw sketch VALUES visible and
  * proves the in-plan audit agrees with an independent computation).
  */
class QuantileSketchSpec extends SparkSpec {

  /** The raw sketch row q85 audits: per flag, n + the four picks. */
  private def rawSketch() =
    graft.Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D), 1000)")
          .as("qs"))
      .select(col("l_returnflag"), col("n"),
        element_at(col("qs"), 1).as("p25"),
        element_at(col("qs"), 2).as("p50"),
        element_at(col("qs"), 3).as("p75"),
        element_at(col("qs"), 4).as("p95"))
      .orderBy("l_returnflag")

  test("every reported quantile is within the n/accuracy rank bound") {
    val out = rawSketch().collect()
    assert(out.nonEmpty)
    val byFlag = graft.Tables.lineitem(spark, sf001)
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }
    out.foreach { r =>
      val flag = r.getString(0)
      val xs = byFlag(flag)
      val n = r.getLong(1)
      assert(n == xs.length.toLong)
      val tol = n.toDouble / 1000.0 + 1 // accuracy-1000 rank error
      Seq(0.25 -> r.getDouble(2), 0.50 -> r.getDouble(3),
        0.75 -> r.getDouble(4), 0.95 -> r.getDouble(5)).foreach {
        case (q, v) =>
          // rank range of v in the sorted group (handles duplicates)
          val lo = xs.count(_ < v)
          val hi = xs.count(_ <= v)
          val target = q * (n - 1)
          assert(target >= lo - tol && target <= hi + tol,
            s"$flag p$q=$v: target rank $target outside [$lo, $hi] ± $tol")
          // the sketch must return an actual group member, not an
          // interpolation (GK picks a kept sample)
          assert(hi > lo, s"$flag p$q=$v is not a member of the group")
      }
    }
  }

  test("the catalog row's in-plan audit agrees: every verdict true") {
    val rows = SparkEntry.queries("q85_quantile_sketch")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: empty group")
      (2 to 5).foreach { i =>
        assert(r.getBoolean(i),
          s"${r.getString(0)}: audit column $i false") }
    }
  }

  test("sketch output is deterministic across runs on the same input") {
    val a = rawSketch().collect()
    val b = rawSketch().collect()
    assert(a.toSeq == b.toSeq)
  }
}
