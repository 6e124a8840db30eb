package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.{MisraGries, PricedRow, TopKOrders}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Semantic anchors for q96 (Misra-Gries heavy hitters + exact confirm)
  * and q97 (bounded-heap top-k per group): the MG survival guarantee
  * under adversarial partitioning, and merge-equivalence of the top-k
  * aggregator with a global sort.
  */
class HeavyHitterTopKSpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries: every item above n/capacity survives any partitioning") {
    val rnd = new Random(7)
    // 10_000 items: 'hot' has 15% share, 'warm' 2%, tail uniform over 5k ids
    val stream = Seq.fill(1500)("hot") ++ Seq.fill(200)("warm") ++
      Seq.fill(8300)(s"t${rnd.nextInt(5000)}")
    val shuffled = rnd.shuffle(stream)
    // adversarial split: hot concentrated at one end, then re-check shuffled
    for (parts <- Seq(Seq(shuffled), shuffled.grouped(1000).toSeq,
        stream.grouped(500).toSeq)) {
      val cands = parts.flatMap(p => MisraGries.candidates(p.iterator, 100)).toSet
      assert(cands.contains("hot"), s"15% item must survive MG(100)")
      assert(cands.contains("warm"), s"2% item must survive MG(100)")
    }
  }

  test("misra-gries: summary never exceeds capacity") {
    val items = (1 to 10000).map(i => s"x${i % 997}")
    assert(MisraGries.candidates(items.iterator, 50).size <= 50)
  }

  test("q96 equals the exact full-vocabulary computation at sf0.001") {
    val docs = Tables.documents(spark, sf0001)
    val got = TextQueries.heavyHitters(docs, 100)
      .select("token", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = docs.select(
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val total = toks.count()
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 100 > total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"missing=${exact.keySet -- got.keySet} " +
      s"extra=${got.keySet -- exact.keySet}")
    assert(exact.nonEmpty, "fixture corpus has >1% tokens")
  }

  test("top-k aggregator: any merge tree equals the global sort") {
    val rnd = new Random(11)
    val rows = Seq.tabulate(500)(i =>
      PricedRow(rnd.nextInt(50).toDouble, i.toLong))
    val expected = rows.sortBy(e => (-e.price, e.id)).take(3)
    val agg = new TopKOrders(3)
    // left fold, chunked merges, and reversed order must all agree
    val folded = rows.foldLeft(agg.zero)(agg.reduce).items
    val merged = rows.grouped(37)
      .map(g => g.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge).items
    val reversed = rows.reverse.foldLeft(agg.zero)(agg.reduce).items
    assert(folded == expected && merged == expected && reversed == expected)
  }

  test("top-k: ties break by lower id; small groups return all rows") {
    val agg = new TopKOrders(3)
    val tied = Seq(PricedRow(5.0, 9L), PricedRow(5.0, 2L), PricedRow(5.0, 5L),
      PricedRow(5.0, 1L))
    assert(tied.foldLeft(agg.zero)(agg.reduce).items.map(_.id) == Seq(1L, 2L, 5L))
    val small = Seq(PricedRow(1.0, 1L))
    assert(small.foldLeft(agg.zero)(agg.reduce).items == small)
  }

  test("q97 output: exactly min(3, orders) rows per customer, ranks dense") {
    val out = SparkEntry.queries("q97_topk_per_group")(spark, sf001)
    val perCust = out.groupBy("custkey")
      .agg(count(lit(1)).as("n"), max("rn").as("maxrn"), min("rn").as("minrn"))
    assert(perCust.where(col("n") =!= col("maxrn") || col("minrn") =!= 1)
      .count() == 0, "ranks must be dense 1..n")
    assert(perCust.where(col("n") > 3).count() == 0)
  }
}
