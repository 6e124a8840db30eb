package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q226 semantic anchor: HITS equals a plain-Scala refold of the
  * bipartite pair list (exact integer path counts), and the plan keeps
  * the q13 top-k discipline (TakeOrderedAndProject; the only windows
  * run above a LIMIT, never over the node domain). */
class HitsSpec extends SparkSpec {

  test("q226: scores equal the integer path-count refold; top-k exact") {
    val pairs = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_suppkey")
      .join(graft.Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("sn"))
      .distinct().as[(String, String)](
        org.apache.spark.sql.Encoders.product[(String, String)])
      .collect().toSeq

    val a1 = pairs.groupBy(_._2).map { case (s, ps) => s -> ps.size.toLong }
    val h1 = pairs.groupBy(_._1).map { case (c, ps) =>
      c -> ps.map(p => a1(p._2)).sum }
    val a2 = pairs.groupBy(_._2).map { case (s, ps) =>
      s -> ps.map(p => h1(p._1)).sum }
    def topK(m: Map[String, Long], k: Int): Seq[(String, Long)] =
      m.toSeq.sortBy { case (n, sc) => (-sc, n) }.take(k)

    val rows = SparkEntry.queries("q226_hits_scores")(spark, sf0001)
      .collect()
    val hubs = rows.filter(_.getAs[String]("side") == "hub")
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("score")))
    val auths = rows.filter(_.getAs[String]("side") == "authority")
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("score")))
    assert(hubs.toSeq == topK(h1, 20), "hub top-k")
    assert(auths.toSeq == topK(a2, 20), "authority top-k")
    // path-count identity: sum of h1 over all hubs = # length-2 paths
    // = sum over suppliers of indeg^2; same identity one level up
    assert(h1.values.sum == a1.values.map(v => v * v).sum)
    assert(rows.length == math.min(20, h1.size) + math.min(20, a2.size))
  }

  test("q226 plan: top-k is TakeOrdered; no node-domain window, no cartesian") {
    val df = SparkEntry.queries("q226_hits_scores")(spark, sf0001)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), phys)
    assert(!phys.contains("CartesianProduct"), phys)
    // every Window must sit above a LIMIT (the 20-row rank stamp) —
    // scan the optimized logical plan: no Window may have the raw
    // aggregate as descendant without an intervening limit
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
    df.queryExecution.optimizedPlan.foreach {
      case w: LWindow =>
        assert(w.collectFirst { case l: GlobalLimit => l }.nonEmpty,
          "rank window not above a limit:\n" + w.treeString)
      case _ => ()
    }
  }
}
