package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q239 semantic anchors: the distributed greedy cover equals a
  * sequential refold of the same election from the raw incidence
  * (exact set algebra, no floats), the step gains are non-increasing
  * (submodularity of coverage), and a planted instance where greedy
  * must pick complementary — not individually largest — sets proves
  * the uncovered-only accounting. */
class SetCoverSpec extends SparkSpec {
  import spark.implicits._

  private def refold(inc: Seq[(String, String)], steps: Int)
      : Seq[(Long, String, Long)] = {
    val bySource = inc.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    var covered = Set.empty[String]
    var out = Vector.empty[(Long, String, Long)]
    (1 to steps).foreach { k =>
      val gains = bySource.toSeq
        .map { case (s, g) => (s, (g -- covered).size.toLong) }
        .filter(_._2 > 0L)
      if (gains.nonEmpty) {
        val (ws, wg) = gains.minBy { case (s, g) => (-g, s) }
        covered ++= bySource(ws)
        out :+= ((k.toLong, ws, wg))
      }
    }
    out
  }

  test("q239: steps equal the sequential refold; gains non-increasing; cumsum exact") {
    val inc = graft.Tables.documents(spark, sf0001)
      .select(col("source"),
        explode(graft.functions.TextFunctions
          .shinglesOfText(col("text"), 3)).as("g"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val expect = refold(inc, steps = 5)
    val universe = inc.map(_._2).distinct.length.toLong

    val rows = SparkEntry.queries("q239_greedy_set_cover")(spark, sf0001)
      .orderBy("step").collect()
    assert(rows.length == expect.length)
    var cum = 0L
    rows.zip(expect).foreach { case (r, (step, src, gain)) =>
      assert(r.getAs[Long]("step") == step)
      assert(r.getAs[String]("source") == src, s"step $step")
      assert(r.getAs[Long]("gain") == gain)
      cum += gain
      assert(r.getAs[Long]("covered") == cum)
      assert(r.getAs[Long]("universe") == universe)
      assert(r.getAs[Double]("coverage_share")
        == cum.toDouble / universe.toDouble)
    }
    // submodularity: greedy marginal gains never increase
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      gains.toSeq.toString)
  }

  test("q239: planted complementarity — greedy prefers disjoint coverage") {
    // One 3-token doc per controlled shingle (a 3-token doc has exactly
    // one 3-gram, so no cross-boundary shingles muddy the sets).
    // srcBig covers {g1..g6}; srcL covers {g1..g4, x1..x3} (7 shingles,
    // the largest single set); srcR covers {g5, g6, y1..y3} (5).
    // Greedy picks srcL first (gain 7); srcBig's residual is then
    // {g5, g6} = 2 < srcR's 5 -> srcR second (a naive size ranking
    // would pick srcBig). After srcR the universe is covered, srcBig's
    // residual is 0 -> it produces NO candidate rows and step 3 is
    // EMPTY: exactly 2 output rows.
    def tri(tag: String) = s"${tag}a ${tag}b ${tag}c"
    val docs = (
      (1 to 6).map(i => ("srcBig", tri(s"g$i")))
        ++ (1 to 4).map(i => ("srcL", tri(s"g$i")))
        ++ (1 to 3).map(i => ("srcL", tri(s"x$i")))
        ++ Seq(("srcR", tri("g5")), ("srcR", tri("g6")))
        ++ (1 to 3).map(i => ("srcR", tri(s"y$i")))
      ).toDF("source", "text")
    val picks = AgreementQueries.greedySetCover(docs, steps = 3)
      .orderBy("step").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("gain")))
    assert(picks.toSeq == Seq(("srcL", 7L), ("srcR", 5L)),
      picks.toSeq.toString)
  }
}
