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
    val h = graft.functions.DeterministicHash.knuth32(col("doc_id"),
      graft.functions.DeterministicHash.sampleSalt)
    val rehashed = docs.withColumn("h", h)
      .where(col("h") % 1000 <
        when(col("lang") === "en", lit(300)).otherwise(lit(800)))
      .select("doc_id").as[Long].collect().toSet
    val catalog = graft.SparkEntry.queries("q56_stratified_sample")(spark, sf001)
      .select("doc_id").as[Long].collect().toSet
    assert(rehashed == catalog, "partition layout changed sample membership")
  }

  test("q56's sample stream is genuinely distinct from q62's split stream") {
    // Both streams are the same Knuth hash with different salts. A share-
    // of-train style check is VACUOUS here (both gates are multiples of
    // 100, so even IDENTICAL streams give a perfectly balanced split
    // inside the sample — review r4); the discriminating property is that
    // the salted stream selects a DIFFERENT set than the unsalted one
    // would. If someone drops the salt, q56's membership collapses onto
    // q62's stream and this set comparison catches it.
    import org.apache.spark.sql.functions.{col, lit, when}
    val gate = (h: org.apache.spark.sql.Column) => h % 1000 <
      when(col("lang") === "en", lit(300)).otherwise(lit(800))
    val docs = graft.Tables.documents(spark, sf001)
    val unsalted = docs
      .where(gate(graft.functions.DeterministicHash.knuth32(col("doc_id"), graft.functions.DeterministicHash.splitSalt)))
      .select("doc_id").as[Long].collect().toSet
    val shipped = graft.SparkEntry.queries("q56_stratified_sample")(spark, sf001)
      .select("doc_id").as[Long].collect().toSet
    assert(shipped != unsalted,
      "q56 selects exactly the salt-0 set — the sample stream degenerated into q62's")
    // and the two sets overlap like independent draws (~64% of the
    // sample), not like disjoint or nested ones
    val overlap = (shipped & unsalted).size.toDouble / shipped.size
    assert(overlap > 0.3 && overlap < 0.95,
      s"overlap $overlap outside any plausible independent-streams band")
  }
}
