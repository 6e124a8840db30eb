package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q237 semantic anchors: the distributed exact-integer MM fixed point
  * equals a sequential BigInt refold of the same algebra from the raw
  * duel matrix (the q231 refold discipline), and the model has
  * discriminating power on a planted tournament — an item that wins
  * every duel gets the top strength, a pure loser the bottom. */
class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  private val S = BigInt(1000000000L)
  private val SP = BigInt(1000000000L) * BigInt(1000000L)

  /** Sequential refold: Laplace-smoothed pair matrix -> 5 MM
    * iterations in exact BigInt floor arithmetic. */
  private def refold(duels: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val pair = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    duels.foreach { case (w, l) =>
      val k = (math.min(w, l), math.max(w, l))
      val (wu, wv) = pair.getOrElse(k, (0L, 0L))
      if (w < l) pair(k) = (wu + 1L, wv) else pair(k) = (wu, wv + 1L)
    }
    val sm = pair.map { case (k, (wu, wv)) => k -> (wu + 1L, wv + 1L) }
    val wins = scala.collection.mutable.Map[Long, Long]()
    sm.foreach { case ((u, v), (wu, wv)) =>
      wins(u) = wins.getOrElse(u, 0L) + wu
      wins(v) = wins.getOrElse(v, 0L) + wv
    }
    var p = wins.keys.map(i => i -> S).toMap
    (1 to iters).foreach { _ =>
      val d = scala.collection.mutable.Map[Long, BigInt]()
      sm.foreach { case ((u, v), (wu, wv)) =>
        val t = BigInt(wu + wv) * SP / (p(u) + p(v))
        d(u) = d.getOrElse(u, BigInt(0)) + t
        d(v) = d.getOrElse(v, BigInt(0)) + t
      }
      p = wins.keys.map { i =>
        i -> (BigInt(wins(i)) * SP / d(i)).max(BigInt(1))
      }.toMap
    }
    p.map { case (i, s) => i -> (wins(i), s.toLong) }
  }

  test("q237: top-20 equals the sequential BigInt refold") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val duels = li.groupBy(_._1).values.flatMap { arr =>
      val basket = arr.toSeq
      for (a <- basket; b <- basket if a._3 > b._3) yield (a._2, b._2)
    }.toSeq
    val fit = refold(duels, iters = 5)
    val expect = fit.toSeq
      .sortBy { case (i, (_, s)) => (-s, i) }.take(20)

    val rows = SparkEntry.queries("q237_bradley_terry")(spark, sf0001)
      .orderBy("rank").collect()
    assert(rows.length == math.min(20, fit.size))
    rows.zip(expect).zipWithIndex.foreach { case ((r, (i, (w, s))), idx) =>
      assert(r.getAs[Long]("rank") == idx + 1L)
      assert(r.getAs[Long]("partkey") == i, s"rank ${idx + 1}")
      assert(r.getAs[Long]("wins_sm") == w)
      assert(r.getAs[Long]("strength") == s)
    }
  }

  test("q237: planted tournament — dominant item tops, pure loser sinks") {
    // items 1..4; item 1 beats everyone twice, item 4 loses everything;
    // 2 vs 3 split. Encode as one order per duel (winner qty 2, loser 1).
    val duels = Seq((1, 2), (1, 2), (1, 3), (1, 3), (1, 4), (1, 4),
      (2, 4), (3, 4), (2, 3), (3, 2))
    val rows = duels.zipWithIndex.flatMap { case ((w, l), o) =>
      Seq((o.toLong, w.toLong, 2.0), (o.toLong, l.toLong, 1.0))
    }.toDF("l_orderkey", "l_partkey", "l_quantity")
    val fit = AgreementQueries.bradleyTerry(rows, iters = 5, k = 4)
      .collect().map(r =>
        (r.getAs[Long]("rank"), r.getAs[Long]("partkey"),
          r.getAs[Long]("strength")))
    assert(fit.head._2 == 1L, s"dominant item should rank 1: ${fit.toSeq}")
    assert(fit.last._2 == 4L, s"pure loser should rank last: ${fit.toSeq}")
    // strengths strictly ordered rank 1 > rank 4
    assert(fit.head._3 > fit.last._3)
    // 2 and 3 are symmetric by construction: equal strengths
    val mid = fit.filter(x => x._2 == 2L || x._2 == 3L).map(_._3)
    assert(mid.toSet.size == 1, s"symmetric items diverged: ${fit.toSeq}")
  }
}
