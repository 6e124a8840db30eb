package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.functions.DeterministicHash

/** q228 semantic anchor: the movement grid equals a plain-Scala HRW
  * refold; the consistent-hashing contract holds (moves land ONLY on
  * the new worker); and assignment balance stays within a binomial
  * band — the guard that keeps the additive-slot skew (8.6-13.6% per
  * worker, 18 sigma, caught at ~sf1 this round) from coming back. */
class RendezvousSpec extends SparkSpec {

  private def winner(docId: Long, fleet: Int): Int = {
    val scores = (0 until fleet).map(w => DeterministicHash.knuth32Local(
      docId * DeterministicHash.shardMultipliers(w),
      DeterministicHash.shardSalt))
    val m = scores.max
    scores.indexWhere(_ == m) // smallest worker on ties
  }

  test("q228: grid equals the refold; moves land only on the new worker; balance holds") {
    val ids = graft.Tables.documents(spark, sf001).select("doc_id")
      .collect().map(_.getLong(0))
    val grid = ids.groupBy(d => (winner(d, 8), winner(d, 9)))
      .map { case (k, v) => k -> v.length.toLong }

    val rows = SparkEntry.queries("q228_rendezvous_sharding")(spark, sf001)
      .collect()
    val got = rows.map(r => (r.getAs[Long]("worker_before").toInt,
      r.getAs[Long]("worker_after").toInt) -> r.getAs[Long]("n_docs")).toMap
    assert(got == grid, s"grid mismatch: $got vs $grid")

    // HRW contract: a doc moves iff the NEW worker out-scores all old
    // ones — every off-diagonal cell lands on worker 8
    rows.foreach { r =>
      assert(r.getAs[Boolean]("moved_only_to_new"),
        s"consistency violated: $r")
      assert(r.getAs[Boolean]("moved")
        == (r.getAs[Long]("worker_before") != r.getAs[Long]("worker_after")))
    }
    // moved share near 1/9 (loose band: [1/27, 3/9])
    val n = ids.length.toDouble
    val movedShare = rows.filter(_.getAs[Boolean]("moved"))
      .map(_.getAs[Long]("n_docs")).sum / n
    assert(movedShare > 1.0 / 27 && movedShare < 3.0 / 9,
      s"moved share $movedShare far from 1/9")
    // balance on the AFTER fleet: every worker within 5 sigma of n/9
    val after = rows.groupBy(_.getAs[Long]("worker_after"))
      .map { case (w, rs) => w -> rs.map(_.getAs[Long]("n_docs")).sum }
    assert(after.size == 9, s"not all workers populated: $after")
    val sigma = math.sqrt(n * (1.0 / 9) * (8.0 / 9))
    after.foreach { case (w, c) =>
      assert(math.abs(c - n / 9) <= 5 * sigma + 1,
        s"worker $w count $c off n/9=${n / 9} by >5 sigma ($sigma)")
    }
  }
}
