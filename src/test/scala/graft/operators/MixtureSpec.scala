package graft.operators

import graft.SparkSpec
import graft.functions.DeterministicHash
import org.apache.spark.sql.functions._

/** q71 domain-mixture semantics: under-budget domains ride through whole,
  * over-budget domains land their realized token mass inside a Bernoulli
  * envelope of the shared budget, the sample is deterministic and
  * partition-independent, and the mixture stream is independent of the
  * q56/q62 hash streams. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def tokenCounts(dir: String): Map[String, Seq[(Long, Long)]] =
    graft.Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("nt"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap

  test("under-budget domains are kept whole; over-budget ones hit the envelope") {
    val bysrc = tokenCounts(sf001)
    val totals = bysrc.view.mapValues(_.map(_._2).sum).toMap
    val budget = totals.values.sum.toDouble / (2.0 * totals.size)
    val out = graft.SparkEntry.queries("q71_domain_mixture_sample")(spark, sf001)
      .as[(Long, String, Long)].collect()
    val kept = out.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
    totals.foreach { case (src, st) =>
      if (st <= budget) {
        assert(kept.getOrElse(src, 0.0) == st.toDouble,
          s"$src is under budget ($st <= $budget) and must be kept whole")
      } else {
        val rate = budget / st
        val toks = bysrc(src).map(_._2)
        // Bernoulli envelope on token mass: 4 sigma of the doc-level draw
        val sigma = math.sqrt(rate * (1 - rate) * toks.map(t => t.toDouble * t).sum)
        assert(math.abs(kept.getOrElse(src, 0.0) - budget) <= 4 * sigma + 1,
          s"$src realized ${kept.getOrElse(src, 0.0)} tokens, budget $budget +- ${4 * sigma}")
      }
    }
  }

  test("the mixture is deterministic and independent of partition layout") {
    val q = graft.SparkEntry.queries("q71_domain_mixture_sample")
    val a = q(spark, sf001).as[(Long, String, Long)].collect().toSeq
    val b = q(spark, sf001).as[(Long, String, Long)].collect().toSeq
    assert(a == b, "hash gate must reproduce the identical mixture")
    // membership is a pure function of (doc_id, per-source rate): recompute
    // the gate from a differently-partitioned scan and compare ids
    val docs = graft.Tables.documents(spark, sf001).repartition(13)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("nt"))
    val st = docs.groupBy("source").agg(sum("nt").as("st"))
    val g = st.agg(sum("st").as("tot"), count(lit(1)).as("ns"))
    val thr = floor(least(lit(1.0),
      (col("tot").cast("double") / (lit(2.0) * col("ns").cast("double")))
        / col("st").cast("double")) * lit(4294967296.0)).cast("long")
    val rehashed = st.crossJoin(g).select(col("source"), thr.as("thr"))
    val ids = docs.join(rehashed, "source")
      .where(DeterministicHash.knuth32(col("doc_id"),
        DeterministicHash.mixtureSalt) < col("thr"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids == a.map(_._1).toSet, "partition layout changed the mixture")
  }

  test("the mixture hash stream is independent of the split and sample streams") {
    // Same Knuth hash, third salt: joint membership across streams should
    // factorize. Check the mixture x split contingency is near-product.
    val docs = graft.Tables.documents(spark, sf001).select("doc_id").as[Long].collect()
    val mix = docs.map(id =>
      DeterministicHash.knuth32Local(id, DeterministicHash.mixtureSalt) % 1000 < 500)
    val spl = docs.map(id =>
      DeterministicHash.knuth32Local(id, 0L) % 1000 < 500)
    val both = docs.indices.count(i => mix(i) && spl(i)).toDouble
    val expect = mix.count(identity).toDouble * spl.count(identity) / docs.length
    val sigma = math.sqrt(docs.length * 0.25)
    assert(math.abs(both - expect) <= 4 * sigma,
      s"streams correlate: joint $both vs independent $expect")
  }
}
