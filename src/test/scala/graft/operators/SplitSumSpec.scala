package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

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
    // seeded: a failing mix must be reproducible
    val rnd = new scala.util.Random(20260812L)
    def unit(): Long = rnd.nextInt(3) match {
      case 0 => rnd.nextLong(1000L)
      case 1 => rnd.nextLong(1000000L)              // just below the split
      case _ => 1000000L + rnd.nextLong(119999000000L) // cent..charge range
    }
    (1 to 20).foreach { i =>
      val n = 1 + rnd.nextInt(200)
      val units = Seq.fill(n)(unit())
      val exact = units.map(BigInt(_)).sum
      val got = splitTotal(units)
      assert(got == exact.toDouble, // toDouble = correctly-rounded exact
        s"split-sum $got != exact $exact for $n units (iter $i, seed 20260812)")
    }
  }

  test("split-sum stays exact below 2^53 and sequence-stable above it") {
    // below 2^53 the combine is exact: verify against correctly-rounded
    // BigInt for a total (~1.44e14) far past the point where a SINGLE
    // long sum of the heaviest per-row units would have wrapped int64
    val big = Seq.fill(1200)(119999999999L)
    assert(splitTotal(big) == big.map(BigInt(_)).sum.toDouble)
    // boundary values around the split
    val edge = Seq(0L, 1L, 999999L, 1000000L, 1000001L, 119999999999L)
    assert(splitTotal(edge) == edge.map(BigInt(_)).sum.toDouble)
    // PAST 2^53 the guarantee is weaker and deliberately so: the combine
    // hi::double * 1e6 + lo::double double-rounds, so the result equals
    // the SAME-SEQUENCE recombination (which the DuckDB oracle mirrors
    // operation for operation — cross-engine bit-parity), not necessarily
    // the correctly-rounded exact total. Assert exactly that contract.
    val huge = Seq.fill(90000)(119999999999L) // ~1.08e16 > 2^53
    val hiSum = huge.map(u => u / 1000000L).sum
    val loSum = huge.map(u => u % 1000000L).sum
    val sameSequence = hiSum.toDouble * 1000000.0 + loSum.toDouble
    assert(splitTotal(huge) == sameSequence)
  }
}
