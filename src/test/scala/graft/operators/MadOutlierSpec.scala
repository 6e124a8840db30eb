package graft.operators

import graft.SparkSpec

/** Semantic anchor for the q82 MAD outlier profile: exact medians, and
  * the robustness property that motivates MAD over mean/stddev — one
  * planted extreme value cannot move the center or the spread estimate.
  */
class MadOutlierSpec extends SparkSpec {
  import spark.implicits._

  private def profile(rows: Seq[(String, Long)]) =
    ExtendedQueries.madOutlierProfile(rows.toDF("source", "n_chars"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap

  test("hand-computed med/mad/outliers, including the even-count half") {
    val out = profile(Seq(
      // srcA: 10,20,30,40,1000 -> med 30, |x-med| = 20,10,0,10,970
      //       -> mad 10, outliers: |x-30| > 30 -> only 1000
      ("srcA", 10L), ("srcA", 20L), ("srcA", 30L), ("srcA", 40L), ("srcA", 1000L),
      // srcB: 10,20,30,50 (even) -> med 25.0, ad = 15,5,5,25 -> mad 10.0
      //       outliers: ad > 30 -> none
      ("srcB", 10L), ("srcB", 20L), ("srcB", 30L), ("srcB", 50L)))
    assert(out("srcA") == ((5L, 30.0, 10.0, 1L)))
    assert(out("srcB") == ((4L, 25.0, 10.0, 0L)))
  }

  test("MAD is robust: the planted extreme does not move med or mad") {
    val base = Seq.tabulate(9)(i => ("s", 100L + i * 10)) // 100..180
    val clean = profile(base)("s")
    val polluted = profile(base :+ (("s", 1000000L)))("s")
    // med shifts only to the adjacent half-step, mad by at most one step;
    // mean/stddev would move by ~100k and ~300k respectively
    assert(clean._2 == 140.0 && clean._3 == 20.0)
    assert(polluted._2 == 145.0 && polluted._3 == 25.0)
    assert(polluted._4 == 1L, "the plant itself is flagged")
  }

  test("zero-spread source: mad 0, everything off-median is an outlier") {
    val out = profile(Seq(("s", 7L), ("s", 7L), ("s", 7L), ("s", 9L)))
    val (n, _, mad, outliers) = out("s")
    assert(n == 4L && mad == 0.0 && outliers == 1L)
  }

  test("real corpus: one row per source, outliers a small fraction") {
    val out = ExtendedQueries.madOutlierProfile(
      graft.Tables.documents(spark, sf001)).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      // uniform-ish synthetic lengths have no tails, so 3*MAD sits inside
      // the body and flags more than a gaussian would (~28% worst source
      // at sf0.01) — the invariant is "a minority", not "a tail"
      assert(r.getLong(4) < r.getLong(1) / 2,
        s"${r.getString(0)}: MAD flags a minority of docs")
    }
  }
}
