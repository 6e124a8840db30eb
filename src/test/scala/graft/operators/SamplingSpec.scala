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

  test("the sample is identical across runs; a subset of the corpus; no duplicates") {
    val q = graft.SparkEntry.queries("q56_stratified_sample")
    val a = q(spark, sf001).as[(Long, String)].collect().toSeq
    val b = q(spark, sf001).as[(Long, String)].collect().toSeq
    assert(a == b, "the deterministic hash must reproduce the identical sample")
    val ids = graft.Tables.documents(spark, sf001)
      .select("doc_id").as[Long].collect().toSet
    assert(a.map(_._1).forall(ids))
    assert(a.map(_._1).distinct.length == a.length, "no row sampled twice")
  }

  test("sample membership is per-row: partition layout cannot change it") {
    // The r1-r3 sampleBy drew from a per-partition RNG stream — the same
    // row could flip in or out under a different partitioning. The hash
    // gate decides from doc_id alone.
    import org.apache.spark.sql.functions.{col, lit, when}
    val docs = graft.Tables.documents(spark, sf001).repartition(13)
    val h = (((col("doc_id") + lit(7919L)) % lit(1000003L)) * lit(2654435761L)) %
      lit(4294967296L)
    val rehashed = docs.withColumn("h", h)
      .where(col("h") % 1000 <
        when(col("lang") === "en", lit(300)).otherwise(lit(800)))
      .select("doc_id").as[Long].collect().toSet
    val catalog = graft.SparkEntry.queries("q56_stratified_sample")(spark, sf001)
      .select("doc_id").as[Long].collect().toSet
    assert(rehashed == catalog, "partition layout changed sample membership")
  }

  test("sample decision is uncorrelated with q62's split assignment") {
    // Same Knuth hash shape, different salt: if the streams were the
    // SAME, every sampled doc's split bucket would be determined by its
    // sample hash (h%1000 < gate implies h%100 pattern); measure the
    // train share inside the sample — it must stay near q62's 80%.
    val sampled = graft.SparkEntry.queries("q56_stratified_sample")(spark, sf001)
      .select("doc_id").as[Long].collect().toSet
    val splitOf = graft.Tables.documents(spark, sf001).select("doc_id").as[Long]
      .collect().map { id =>
        val h = ((id % 1000003L) * 2654435761L) % 4294967296L
        id -> (if (h % 100 < 80) "train" else "heldout")
      }.toMap
    val trainShare = sampled.count(id => splitOf(id) == "train").toDouble / sampled.size
    assert(math.abs(trainShare - 0.8) < 0.05,
      s"train share inside the sample drifted to $trainShare — salt correlation")
  }
}
