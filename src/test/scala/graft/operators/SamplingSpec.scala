package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q56 stratified sampling semantics: per-stratum proportions near their
  * targets, determinism under a fixed seed, and strata isolation (no
  * stratum leaks rows it should not have). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val fractions =
    Map("en" -> 0.3, "es" -> 0.8, "de" -> 0.8, "fr" -> 0.8, "zh" -> 0.8)

  test("per-stratum sample proportions land near their targets") {
    val base = graft.Tables.documents(spark, sf001)
    val totals = base.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = graft.SparkEntry.queries("q56_stratified_sample")(spark, sf001)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    fractions.foreach { case (lang, frac) =>
      val n = totals(lang).toDouble
      val got = sampled.getOrElse(lang, 0L).toDouble
      // 4-sigma Bernoulli envelope around the target fraction
      val sigma = math.sqrt(frac * (1 - frac) * n)
      assert(math.abs(got - frac * n) <= 4 * sigma + 1,
        s"$lang: sampled $got of $n, target ${frac * n} +- ${4 * sigma}")
    }
  }

  test("fixed seed -> identical sample; the sample is a subset of the corpus") {
    val q = graft.SparkEntry.queries("q56_stratified_sample")
    val a = q(spark, sf001).as[(Long, String)].collect().toSeq
    val b = q(spark, sf001).as[(Long, String)].collect().toSeq
    assert(a == b, "same seed must reproduce the identical sample")
    val ids = graft.Tables.documents(spark, sf001)
      .select("doc_id").as[Long].collect().toSet
    assert(a.map(_._1).forall(ids))
    assert(a.map(_._1).distinct.length == a.length, "no row sampled twice")
  }
}
