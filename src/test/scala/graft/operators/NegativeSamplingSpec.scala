package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.functions.DeterministicHash
import org.apache.spark.sql.functions._

/** q227 semantic anchor: the distributed sampler equals a plain-Scala
  * refold of the pool/ring election, negatives are never the anchor or
  * an exact duplicate, and the sampler actually resolves (the corpus
  * is dense enough that 'ok' dominates). */
class NegativeSamplingSpec extends SparkSpec {

  test("q227: rows equal the sequential refold; exclusions hold") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val sig = docs.map { case (id, t) =>
      id -> java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.toMap
    val b = math.min(math.max(1L, docs.length / 16L), 2147483647L)
    val ring = docs.map { case (id, _) =>
      (id, DeterministicHash.knuth32Local(id, DeterministicHash.negRingSalt))
    }
    val pools = ring.groupBy { case (_, r) => r % b }

    def elect(anchor: Long, slot: Long): (String, Option[Long]) = {
      val p = DeterministicHash.knuth32Local(anchor * 6 + slot,
        DeterministicHash.negProbeSalt)
      pools.get(p % b) match {
        case None => ("empty_bucket", None)
        case Some(members) =>
          val succ = members.filter(_._2 >= p)
          val pool2 = if (succ.nonEmpty) succ else members
          // lexicographic (r, doc_id) min
          val (cand, _) = pool2.minBy { case (id, r) => (r, id) }
          if (cand == anchor || sig(cand) == sig(anchor))
            ("self_or_dup", None)
          else ("ok", Some(cand))
      }
    }

    val rows = SparkEntry.queries("q227_negative_sampling")(spark, sf0001)
      .collect()
    assert(rows.length == docs.length * 5)
    var okCount = 0
    rows.foreach { r =>
      val a = r.getAs[Long]("anchor_id")
      val s = r.getAs[Long]("slot")
      val (reason, neg) = elect(a, s)
      assert(r.getAs[String]("reason") == reason, s"($a,$s) reason")
      assert(Option(r.getAs[java.lang.Long]("neg_id")).map(_.toLong) == neg,
        s"($a,$s) neg_id")
      neg.foreach { n =>
        assert(n != a, "negative equals anchor")
        assert(sig(n) != sig(a), "negative is an exact dup")
        if (true) okCount += 1
      }
    }
    // the sampler must be USEFUL on this corpus, not vacuously green
    assert(okCount > rows.length / 2,
      s"only $okCount/${rows.length} slots resolved")
    // determinism across plans: a second run yields identical rows
    val again = SparkEntry.queries("q227_negative_sampling")(spark, sf0001)
      .collect()
    assert(again.map(_.toString).sorted.toSeq
      == rows.map(_.toString).sorted.toSeq)
  }
}
