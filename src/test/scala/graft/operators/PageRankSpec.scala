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

/** q144 degree distribution + q145 assortativity: closed-form graph
  * anchors beyond the DuckDB hash gate. */
class DegreeStatsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("q144: log2 buckets are exact and node counts reconcile") {
    val rows = graft.SparkEntry.queries("q144_degree_distribution")(
      spark, sf001)
      .select("log2_bucket", "n_nodes", "min_deg", "max_deg")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, _, lo, hi) =>
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b must hold degrees in [2^$b, 2^${b + 1}): [$lo, $hi]")
    }
    val edges = GraphQueries.purchaseEdges(spark, sf001)
    val nNodes = edges.select("src").distinct().count()
    assert(rows.map(_._2).sum == nNodes, "every node in exactly one bucket")
  }

  test("q145: a star graph is perfectly disassortative (r = -1)") {
    // hub h <-> leaves l1..l4, symmetric: every edge pairs degree 4
    // with degree 1 in one orientation or the other -> r = -1 exactly
    val leaves = (1 to 4).map(i => s"l$i")
    val edges = (leaves.map(l => ("h", l)) ++ leaves.map(l => (l, "h")))
      .toDF("src", "dst")
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val ed = edges
      .join(deg.select(col("node").as("src"), col("d").as("x")), "src")
      .join(deg.select(col("node").as("dst"), col("d").as("y")), "dst")
    // recompute via the shipped query body shape on a tiny frame: easier
    // to assert through the public entry by writing the same aggregate
    val s = ed.agg(count(lit(1)).cast("double").as("n"),
      sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy")).collect().head
    val num = s.getDouble(0) * s.getDouble(3) - s.getDouble(1) * s.getDouble(2)
    val den = math.sqrt(s.getDouble(0) * s.getDouble(4)
      - s.getDouble(1) * s.getDouble(1)) *
      math.sqrt(s.getDouble(0) * s.getDouble(5)
        - s.getDouble(2) * s.getDouble(2))
    assert(math.abs(num / den - (-1.0)) < 1e-12, s"star r = ${num / den}")
    // and the real purchase graph sits strictly inside [-1, 1]
    val real = graft.SparkEntry.queries("q145_degree_assortativity")(
      spark, sf001).select("assortativity").as[Double].collect().head
    assert(real > -1.0 && real < 1.0, s"real-graph r: $real")
  }
}
