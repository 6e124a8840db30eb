package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q214/q220 supplement to TemporalPropertiesSpec: the Holt backtest
  * equals a driver-side sequential refold with the identical IEEE
  * tree, and the walk-forward property holds (each forecast uses the
  * strict prefix only). */
class TemporalPropertiesSpec2 extends SparkSpec {
  import spark.implicits._

  test("q220: every row equals the sequential Holt refold; forecasts are walk-forward") {
    val grid = graft.Tables.orders(spark, sf0001)
      .select(date_trunc("month", col("o_orderdate")).as("m"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .groupBy("m").agg(sum("cents").cast("double").as("y"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
      .sortBy(_._1.getTime)
    val ys = grid.map(_._2)
    // brute force: for each t (0-based >= 2), fold the strict prefix
    def fold(prefix: Array[Double]): (Double, Double) = {
      var l = prefix(0)
      var b = prefix(1) - prefix(0)
      for (x <- prefix.drop(2)) {
        val l2 = 0.5 * x + 0.5 * (l + b)
        val b2 = 0.3 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.7 * b
        l = l2; b = b2
      }
      (l, b)
    }
    val rows = SparkEntry.queries("q220_holt_backtest")(spark, sf0001)
      .collect()
    assert(rows.length == ys.length - 2)
    for (r <- rows) {
      val t = r.getAs[Long]("n_train").toInt // prefix length = t
      val (l, b) = fold(ys.take(t))
      assert(r.getAs[Double]("level") == l, s"level at n_train=$t")
      assert(r.getAs[Double]("trend") == b, s"trend at n_train=$t")
      assert(r.getAs[Double]("yhat") == l + b)
      // walk-forward: the target month's own value never enters the
      // state — perturbing y_t must leave (level, trend) unchanged
      val perturbed = ys.take(t) // prefix excludes index t by construction
      assert(fold(perturbed) == ((l, b)))
      assert(r.getAs[Long]("y_cents") == ys(t).toLong)
    }
  }
}
