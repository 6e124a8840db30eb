package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q238 semantic anchors: the Hamilton invariants hold exactly on the
  * real corpus (sum(alloc) = B; every domain within one seat of its
  * exact share; seats go to the largest remainders), and a planted
  * frame with a remainder tie exercises the deterministic source
  * tie-break. */
class ApportionSpec extends SparkSpec {
  import spark.implicits._

  test("q238: Hamilton invariants hold exactly on the corpus") {
    val rows = SparkEntry.queries("q238_hamilton_apportionment")(
      spark, sf0001).collect()
    val b = rows.head.getAs[Long]("budget")
    val t = rows.map(_.getAs[Long]("avail_tokens")).sum
    assert(rows.map(_.getAs[Long]("alloc")).sum == b, "sum(alloc) != B")
    rows.foreach { r =>
      val tok = r.getAs[Long]("avail_tokens")
      val alloc = r.getAs[Long]("alloc")
      val quota = r.getAs[Long]("quota")
      // floor quota and mod remainder recompute exactly
      assert(quota == (BigInt(b) * BigInt(tok) / BigInt(t)).toLong)
      assert(r.getAs[Long]("remainder_num")
        == (BigInt(b) * BigInt(tok) % BigInt(t)).toLong)
      assert(alloc == quota || alloc == quota + 1L, "not within one seat")
      // within one seat of the exact share: |alloc*T - B*tok| < T
      assert((BigInt(alloc) * t - BigInt(b) * tok).abs < BigInt(t))
    }
    // the +1 seats go exactly to the `leftover` largest remainders
    val lv = rows.head.getAs[Long]("leftover")
    val plusOne = rows.filter(r => r.getAs[Long]("alloc")
      == r.getAs[Long]("quota") + 1L)
    assert(plusOne.length == lv)
    assert(plusOne.forall(_.getAs[Long]("remainder_rank") <= lv))
  }

  test("q238: planted remainder tie breaks by source, sum stays exact") {
    // tok = (5, 4, 4): T=13, B=(3*13) div 7=5, quota=(1,1,1),
    // rem=(12,7,7) -> leftover 2, and the 7-7 tie sits EXACTLY at the
    // seat cutoff: srcA + srcB (source ASC wins the tie) get +1,
    // srcC does not -> alloc (2,2,1), sum 5.
    val docs = (Seq.fill(5)("srcA") ++ Seq.fill(4)("srcB")
      ++ Seq.fill(4)("srcC")).map(s => (s, "tok"))
      .toDF("source", "text")
    val rows = AgreementQueries.apportion(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("alloc")))
      .toMap
    assert(rows.values.sum == 5L)
    assert(rows == Map("srcA" -> 2L, "srcB" -> 2L, "srcC" -> 1L),
      s"tie-break wrong: $rows")
  }
}
