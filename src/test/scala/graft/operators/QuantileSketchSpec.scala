package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic anchor for the rows-only q85: the GK sketch's rank-error
  * contract against exact sorted ranks, and run-to-run determinism —
  * the floor that stands in for an oracle hash (q46's pattern).
  */
class QuantileSketchSpec extends SparkSpec {

  test("every reported quantile is within the n/accuracy rank bound") {
    val out = SparkEntry.queries("q85_quantile_sketch")(spark, sf001).collect()
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

  test("sketch output is deterministic across runs on the same input") {
    val a = SparkEntry.queries("q85_quantile_sketch")(spark, sf001).collect()
    val b = SparkEntry.queries("q85_quantile_sketch")(spark, sf001).collect()
    assert(a.toSeq == b.toSeq)
  }
}
