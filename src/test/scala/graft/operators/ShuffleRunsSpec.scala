package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.functions.DeterministicHash

/** q233 semantic anchors: (1) the bucketed distributed runs counter
  * equals a plain-Scala refold of the global hash order (the oracle's
  * single-lag form), including the per-source run-start attribution
  * and the exact E[R]/Var[R]/z doubles; (2) sign convention — a
  * corpus whose labels are CLUMPED along the shuffle order drives z
  * strongly negative. */
class ShuffleRunsSpec extends SparkSpec {

  private def refold(docs: Seq[(Long, String)])
      : (Map[String, (Long, Long)], Long) = {
    val ordered = docs
      .map { case (id, s) =>
        (DeterministicHash.knuth32Local(id, DeterministicHash.shuffleSalt),
          id, s)
      }
      .sortBy { case (h, id, _) => (h, id) }
    var prev: String = null
    val per = scala.collection.mutable.Map[String, (Long, Long)]()
    var r = 0L
    ordered.foreach { case (_, _, s) =>
      val (n, st) = per.getOrElse(s, (0L, 0L))
      val isStart = prev == null || prev != s
      if (isStart) r += 1L
      per(s) = (n + 1L, st + (if (isStart) 1L else 0L))
      prev = s
    }
    (per.toMap, r)
  }

  test("q233: sf0.001 equals the global-order refold") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (per, r) = refold(docs)
    val n = docs.size.toLong
    val s2 = per.values.map { case (c, _) => c * c }.sum
    val s3 = per.values.map { case (c, _) => c * c * c }.sum
    val eRuns = (n * (n + 1) - s2).toDouble / n.toDouble
    val varRuns = (s2 * (s2 + n * (n + 1)) - 2 * n * s3 - n * n * n)
      .toDouble / (n * n * (n - 1)).toDouble
    val z = (r.toDouble - eRuns) / math.sqrt(varRuns)

    val rows = SparkEntry.queries("q233_shuffle_runs_audit")(spark, sf0001)
      .orderBy("source").collect()
    assert(rows.length == per.size)
    assert(rows.map(_.getAs[Long]("runs_started")).sum == r,
      "per-source run starts must sum to the total runs count")
    rows.foreach { row =>
      val s = row.getAs[String]("source")
      val (nd, st) = per(s)
      assert(row.getAs[Long]("n_docs") == nd, s"$s n_docs")
      assert(row.getAs[Long]("runs_started") == st, s"$s runs_started")
      assert(row.getAs[Long]("n_total") == n)
      assert(row.getAs[Long]("k_classes") == per.size.toLong)
      assert(row.getAs[Long]("runs_total") == r)
      assert(row.getAs[Double]("e_runs") == eRuns)
      assert(row.getAs[Double]("var_runs") == varRuns)
      assert(row.getAs[Double]("z_score") == z)
    }
    // a hash-shuffled order should be statistically unremarkable
    assert(math.abs(z) < 5.0,
      s"hash order reads as non-random (z = $z) — salt stream broken?")
  }

  test("q233: clumped labels drive z strongly negative") {
    import spark.implicits._
    // label by the MEDIAN of the hash order itself: first half 'a',
    // second half 'b' -> exactly 2 runs, maximal clumping
    val ids = (1L to 400L).toVector
    val byHash = ids.sortBy(id =>
      (DeterministicHash.knuth32Local(id, DeterministicHash.shuffleSalt),
        id))
    val lab = byHash.zipWithIndex
      .map { case (id, i) => (id, if (i < 200) "a" else "b") }
    val out = ExtendedQueries.shuffleRunsAudit(
      lab.toDF("doc_id", "source")).collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("runs_total") == 2L)
    assert(out.head.getAs[Double]("z_score") < -5.0)
  }
}
