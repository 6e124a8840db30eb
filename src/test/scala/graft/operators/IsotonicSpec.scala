package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q224 semantic anchor: the minimax closed-form fit equals classic
  * sequential pool-adjacent-violators (PAV) computed driver-side with
  * EXACT rational pooling (Long numerator/denominator pairs, cross-
  * multiplied comparisons — no FP in the merge decisions). Rounding is
  * monotone, so max/min elections over rounded single-division means
  * commute with rounding and the elected value is bit-identical to the
  * pooled mean's one division — asserted with ==, not a tolerance. */
class IsotonicSpec extends SparkSpec {

  test("q224: fitted equals exact-rational PAV bit-for-bit and is monotone") {
    val rows = SparkEntry.queries("q224_isotonic_calibration")(spark, sf0001)
      .orderBy("score_bin").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n"))
    val p = rows.map(_.getAs[Long]("n_pos"))

    // classic PAV; pools carry exact integer (sum_pos, sum_n, width)
    final case class Pool(sp: Long, sn: Long, w: Int)
    val stack = scala.collection.mutable.Stack[Pool]()
    for (i <- rows.indices) {
      var cur = Pool(p(i), n(i), 1)
      // prev mean >= cur mean  <=>  prev.sp * cur.sn >= cur.sp * prev.sn
      // (counts at sf0.001 are ~1e3, products nowhere near Long range)
      while (stack.nonEmpty &&
          stack.top.sp * cur.sn >= cur.sp * stack.top.sn) {
        val t = stack.pop()
        cur = Pool(t.sp + cur.sp, t.sn + cur.sn, t.w + cur.w)
      }
      stack.push(cur)
    }
    val pav: Seq[Double] = stack.toList.reverse.flatMap(pl =>
      List.fill(pl.w)(pl.sp.toDouble / pl.sn.toDouble))
    assert(pav.length == rows.length)

    rows.indices.foreach { i =>
      assert(rows(i).getAs[Double]("fitted") == pav(i),
        s"bin ${rows(i).getAs[Long]("score_bin")}: " +
          s"query ${rows(i).getAs[Double]("fitted")} vs PAV ${pav(i)}")
      assert(rows(i).getAs[Boolean]("monotone_ok"), s"bin $i monotonicity")
    }
    // the fit actually pools somewhere on this corpus (non-trivial PAV),
    // and raw rates are NOT already monotone — otherwise the test would
    // pass vacuously with fitted == raw everywhere
    val raw = rows.map(_.getAs[Double]("raw_rate"))
    assert(raw.zip(raw.tail).exists { case (a, b) => a > b },
      "sf0.001 raw reliability grid is unexpectedly already monotone")
  }
}
