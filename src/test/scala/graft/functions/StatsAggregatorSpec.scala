package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** StatsAggregator's claim is "outputs equal built-ins" — verify it on the
  * cases the built-ins make awkward: NULL inputs (skipped, not coerced to
  * 0.0) and all-null groups (count 0, NULL sum/min/max). */
class StatsAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("matches count/sum/min/max exactly, including null inputs and all-null groups") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(3.0)), ("a", None), ("a", Some(-1.5)),
      ("b", None), ("b", None), // all-null group
      ("c", Some(7.25))
    ).toDF("g", "x")
    val stats = udaf(StatsAggregator, Encoders.DOUBLE)

    val got = df.groupBy("g")
      .agg(stats(col("x")).as("st"),
        count(col("x")).as("bn"), sum(col("x")).as("bs"),
        min(col("x")).as("bmin"), max(col("x")).as("bmax"))
      .select(col("g"),
        col("st.n"), col("st.sum"), col("st.min"), col("st.max"),
        col("bn"), col("bs"), col("bmin"), col("bmax"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
           Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap

    got.values.foreach { case (g, n, s, mn, mx, bn, bs, bmin, bmax) =>
      assert(n == bn, s"group $g: n $n != count $bn")
      assert(s == bs, s"group $g: sum $s != sum $bs")
      assert(mn == bmin, s"group $g: min $mn != min $bmin")
      assert(mx == bmax, s"group $g: max $mx != max $bmax")
    }
    // the all-null group really is the null-equivalent shape
    val (_, n, s, mn, mx, _, _, _, _) = got("b")
    assert(n == 0L && s.isEmpty && mn.isEmpty && mx.isEmpty)
  }
}
