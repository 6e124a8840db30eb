package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the purchase-graph node-id codec (r15: the graph family
  * computes over int64 node ids instead of 'c<key>'/'s<key>' strings —
  * guide §2.3 narrower shuffle types). The contract the optimization
  * rests on: the encoding is ORDER-ISOMORPHIC to the byte-lexicographic
  * order of the old strings (so min-label propagation, orderBy and
  * tie-breaks commute with it) and decode is its exact inverse. The
  * key set below is adversarial for decimal-vs-lex order: prefixes
  * ("1" vs "10" vs "100" vs "105"), the classic numeric/lex inversion
  * ("10" < "9" lex), zero, and the 15-digit bound. */
class NodeCodecSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq(0L, 1L, 2L, 9L, 10L, 11L, 19L, 20L, 90L, 99L,
    100L, 105L, 900L, 999L, 1000L, 1005L, 12345L, 99999L, 150000L,
    1500000L, 15000000L, 1234567890L, 15000000000L, 99999999999999L,
    999999999999999L /* 15 digits — the documented bound */)

  private def frame = keys.toDF("k").select(
    col("k"),
    GraphQueries.custEnc(col("k")).as("ce"),
    GraphQueries.suppEnc(col("k")).as("se"),
    concat(lit("c"), col("k").cast("string")).as("cs"),
    concat(lit("s"), col("k").cast("string")).as("ss"))

  test("decode is the exact inverse of encode for both node types") {
    val bad = frame.where(
      GraphQueries.decodeNode(col("ce")) =!= col("cs") ||
      GraphQueries.decodeNode(col("se")) =!= col("ss"))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
  }

  test("encoding is order-isomorphic to byte-lex order of the strings") {
    val rows = frame.collect().map(r =>
      (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    // all customer encodings sort below all supplier encodings, as
    // every 'c...' string sorts below every 's...' string
    assert(rows.map(_._1).max < rows.map(_._2).min)
    // within each type: enc order == string order for every pair
    for (a <- rows; b <- rows) {
      assert((a._1 < b._1) == (a._3 < b._3),
        s"cust order diverges: ${a._3} vs ${b._3}")
      assert((a._2 < b._2) == (a._4 < b._4),
        s"supp order diverges: ${a._4} vs ${b._4}")
    }
  }

  test("min over encoded ids commutes with min over strings (q165's rule)") {
    val minEnc = frame.agg(min("ce"), min("se")).head()
    val minStr = frame.agg(min("cs"), min("ss")).head()
    val dec = frame.sparkSession.range(1).select(
      GraphQueries.decodeNode(lit(minEnc.getLong(0))),
      GraphQueries.decodeNode(lit(minEnc.getLong(1)))).head()
    assert(dec.getString(0) == minStr.getString(0))
    assert(dec.getString(1) == minStr.getString(1))
  }

  test("q95/q165/q226 decoded outputs carry the original string ids") {
    val nodes = SparkEntry_q95(sf0001).select("node")
      .as[String].collect()
    assert(nodes.nonEmpty)
    assert(nodes.forall(n => n.matches("[cs][0-9]+")), nodes.take(5).toSeq)
    assert(nodes.toSeq == nodes.toSeq.sorted, "ORDER BY node is lex order")
  }

  private def SparkEntry_q95(d: String) =
    graft.SparkEntry.queries("q95_pagerank")(spark, d)
}

/** Pins the scale-adaptive partition formula for the graph iteration
  * operators (r14 verdict item 3): derived from leaf scan bytes at
  * ~2 MiB/task, inert at bench scale, engaged (and capped) as the
  * input grows — no env var required for the 64x probe to stay
  * linear. */
class GraphPartsSpec extends SparkSpec {
  private val MiB = 1024L * 1024
  private def f(leaf: Long, default: Int = 32) =
    GraphQueries.scalePartsFor(BigInt(leaf), default, 2 * MiB)

  test("bench scale stays on the session default (sf0.1 ~27 MB of leaves)") {
    assert(f(27 * MiB) === None)
    assert(f(64 * MiB) === None, "exactly at default width: no repartition")
  }

  test("64x-probe scale derives a wider plan from the data") {
    val n = f(64 * 27 * MiB)
    assert(n.exists(_ >= 256), s"expected >=256 parts, got $n")
  }

  test("width is capped (a cluster raises the cap with its core count)") {
    assert(f(100L * 1024 * MiB) === Some(4096))
  }

  test("q95 at test SF carries no explicit repartition node") {
    val df = graft.SparkEntry.queries("q95_pagerank")(spark, sf0001)
    val p = df.queryExecution.optimizedPlan.toString()
    assert(!p.toLowerCase.contains("repartition"), p.take(2000))
  }
}
