package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic anchors for q95's fixed-point PageRank: hand-computed exact
  * units on a planted star graph, bounded truncation loss of total
  * mass, and the hub property on the real purchase graph.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("one iteration on a star graph matches hand-computed exact units") {
    // a <-> b, a <-> c: outdeg a=2, b=c=1; N=3, S=1e12
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"))
      .toDF("src", "dst")
    val r = GraphQueries.pagerank(edges, iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // r0 = 1e12 DIV 3 = 333333333333; damped = *17 DIV 20 = 283333333333
    // base = (3e12 DIV 20) DIV 3 = 50000000000
    // a gets both leaves' full damped rank; b,c get half of a's
    assert(r("a") == 50000000000L + 283333333333L + 283333333333L)
    assert(r("b") == 50000000000L + 141666666666L)
    assert(r("c") == r("b"), "symmetric leaves tie exactly")
  }

  test("mass is conserved up to bounded truncation loss") {
    val edges = GraphQueries.purchaseEdges(spark, sf0001)
    val n = edges.select("src").distinct().count()
    val e = edges.count()
    val iters = 3
    val total = GraphQueries.pagerank(edges, iters)
      .agg(sum("rank_u")).head().getLong(0)
    val S = 1000000000000L
    assert(total <= S, "fixed-point truncation can only lose mass")
    val bound = (20 * n + e + n) * iters + n
    assert(S - total <= bound,
      s"lost ${S - total} units, bound $bound (n=$n, e=$e)")
  }

  test("real graph: every supplier outranks every customer (hub property)") {
    val rows = SparkEntry.queries("q95_pagerank")(spark, sf001).collect()
    val (supp, cust) = rows.partition(_.getString(0).startsWith("s"))
    assert(supp.nonEmpty && cust.nonEmpty)
    val minSupp = supp.map(_.getLong(1)).min
    val maxCust = cust.map(_.getLong(1)).max
    assert(minSupp > maxCust,
      s"suppliers aggregate ~15x more in-edges: minSupp=$minSupp maxCust=$maxCust")
    // ranks are strictly positive and integer-exact by construction
    assert(rows.forall(_.getLong(1) > 0))
  }
}
