package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q232 semantic anchors: (1) a hand graph where the single distance-2
  * non-adjacent pair and its exact Resource-Allocation contributions
  * are computable on paper; (2) the sf0.001 catalog output equals a
  * plain-Scala refold of the same edge list (integer RA election,
  * (ra desc, cn desc, pair) order), and the emitted ra_index double
  * reproduces bit-for-bit from the integer key. */
class LinkPredictionSpec extends SparkSpec {

  test("q232: hand graph — single candidate pair, exact RA") {
    import spark.implicits._
    // 1-2, 1-3, 2-3, 2-4, 3-4: the only non-adjacent pair is (1,4),
    // common neighbors {2,3}, both of degree 3.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val out = GraphQueries.linkPrediction(e, k = 20).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("rank") == 1L)
    assert(r.getAs[Long]("part_a") == 1L)
    assert(r.getAs[Long]("part_b") == 4L)
    assert(r.getAs[Long]("common_neighbors") == 2L)
    val w3 = 1000000000000L / 3L
    assert(r.getAs[Long]("ra_scaled") == 2L * w3)
    assert(r.getAs[Double]("ra_index") == (2L * w3).toDouble / 1.0e12)
  }

  test("q232: sf0.001 top-20 equals the sequential refold") {
    val op = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = GraphQueries.coOccurrenceEdgesFromDistinct(op, 2L)
      .select(col("u").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = collection.mutable.Map[Long, collection.mutable.Set[Long]]()
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, collection.mutable.Set.empty[Long]) += v
      adj.getOrElseUpdate(v, collection.mutable.Set.empty[Long]) += u
    }
    val es = edges.toSet
    val cand =
      collection.mutable.Map[(Long, Long), (Long, Long)]()
    adj.foreach { case (_, nbrs) =>
      val w = 1000000000000L / nbrs.size
      val ns = nbrs.toVector.sorted
      for (i <- ns.indices; j <- i + 1 until ns.length) {
        val key = (ns(i), ns(j))
        if (!es.contains(key)) {
          val (cn, ra) = cand.getOrElse(key, (0L, 0L))
          cand(key) = (cn + 1L, ra + w)
        }
      }
    }
    val expect = cand.toSeq
      .map { case ((a, c), (cn, ra)) => (a, c, cn, ra) }
      .sortBy { case (a, c, cn, ra) => (-ra, -cn, a, c) }
      .take(20)

    val rows = SparkEntry.queries("q232_link_prediction")(spark, sf0001)
      .orderBy("rank").collect()
    assert(rows.length == math.min(20, cand.size))
    assert(rows.nonEmpty, "sf0.001 co-graph yields no candidate pairs")
    rows.zip(expect).zipWithIndex.foreach { case ((r, e), i) =>
      assert(r.getAs[Long]("rank") == i + 1L)
      assert(r.getAs[Long]("part_a") == e._1, s"rank ${i + 1} a")
      assert(r.getAs[Long]("part_b") == e._2, s"rank ${i + 1} b")
      assert(r.getAs[Long]("common_neighbors") == e._3)
      assert(r.getAs[Long]("ra_scaled") == e._4)
      assert(r.getAs[Double]("ra_index") == e._4.toDouble / 1.0e12)
    }
  }
}
