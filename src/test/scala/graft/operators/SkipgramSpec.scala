package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q231 semantic anchor: the distributed skip-gram table equals a
  * plain-Scala refold (pair counting at distances 1 and 2, canonical
  * keys, exact BigInt-scaled lift election with pair tie-break), and
  * the lift double recomputes bit-for-bit with the same association
  * order. Tokenization itself is pinned by q164's parity suite — this
  * spec folds the query's own token arrays. */
class SkipgramSpec extends SparkSpec {

  test("q231: top-20 equals the sequential refold; lift bit-exact") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .collect().map(_.getSeq[String](0).toVector)

    val uni = scala.collection.mutable.Map[String, Long]()
    val pairs = scala.collection.mutable.Map[String, Long]()
    var np = 0L
    docs.foreach { w =>
      w.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1L)
      for (d <- 1 to 2; i <- 0 until w.length - d) {
        val (a, b) = (w(i), w(i + d))
        val key = if (a <= b) s"$a $b" else s"$b $a"
        pairs(key) = pairs.getOrElse(key, 0L) + 1L
        np += 1L
      }
    }
    val nu = uni.values.sum
    val cand = pairs.toSeq.filter(_._2 >= 5L).map { case (pair, cxy) =>
      val Array(w1, w2) = pair.split(" ", 2)
      val scaled = (BigInt(cxy) * BigInt(1000000000000L)
        / (BigInt(uni(w1)) * BigInt(uni(w2)))).toLong
      (pair, w1, w2, cxy, uni(w1), uni(w2), scaled)
    }
    val expect = cand.sortBy { case (pair, _, _, _, _, _, s) => (-s, pair) }
      .take(20)

    val rows = SparkEntry.queries("q231_skipgram_assoc")(spark, sf0001)
      .orderBy("rank").collect()
    assert(rows.length == math.min(20, cand.length))
    rows.zip(expect).zipWithIndex.foreach { case ((r, e), i) =>
      assert(r.getAs[Long]("rank") == i + 1L)
      assert(r.getAs[String]("pair") == e._1, s"rank ${i + 1} pair")
      assert(r.getAs[Long]("c_pair") == e._4)
      assert(r.getAs[Long]("c_w1") == uni(e._2))
      assert(r.getAs[Long]("c_w2") == uni(e._3))
      // identical association order reproduces the double exactly
      val lift = ((e._4.toDouble * nu.toDouble) * nu.toDouble) /
        ((np.toDouble * e._5.toDouble) * e._6.toDouble)
      assert(r.getAs[Double]("lift") == lift, s"rank ${i + 1} lift")
    }
    // non-vacuity: an associated pair must beat independence (lift > 1)
    assert(rows.head.getAs[Double]("lift") > 1.0,
      "top skip-gram pair shows no positive association")
  }
}
