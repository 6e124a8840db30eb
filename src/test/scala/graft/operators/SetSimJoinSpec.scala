package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Semantic anchors for q91, the exact AllPairs prefix-filtered
  * set-similarity self-join: edge-set equality against the brute-force
  * all-pairs join (the theorem says recall is exactly 1.0 — verify it),
  * and evidence that the prefix filter actually prunes the candidate
  * space.
  */
class SetSimJoinSpec extends SparkSpec {

  test("q91 equals brute force exactly at sf0.001 (recall 1.0 by theorem)") {
    val docs = Tables.documents(spark, sf0001)
    val got = DedupQueries.prefixFilterPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"),
        TextFunctions.shinglesOfText(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        TextFunctions.jaccard(col("a.sh"), col("b.sh")).as("jac"))
      .where(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
  }

  test("q91 jac values are exact intersection/union ratios") {
    val rows = SparkEntry.queries("q91_setsim_join_exact")(spark, sf001)
      .collect()
    assert(rows.length == 25, "sf0.01 corpus has 25 pairs at tau=0.5")
    rows.foreach { r =>
      val (inter, a, b, jac) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(jac == inter.toDouble / (a + b - inter), r.toString)
      assert(jac >= 0.5 && 2 * math.min(a, b) >= math.max(a, b),
        "length filter is implied by the threshold")
    }
  }

  test("prefix filter prunes: candidates well below the all-pairs product") {
    val docs = Tables.documents(spark, sf001)
    val sh = docs.select(col("doc_id"),
        TextFunctions.shinglesOfText(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("tok"))
    val dfreq = ex.groupBy("tok").agg(count(lit(1)).as("df"))
    val ordered = ex.join(dfreq, "tok").groupBy("doc_id")
      .agg(transform(
        sort_array(collect_list(struct(col("df"), col("tok")))),
        x => x.getField("tok")).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).as("sz"))
    val pref = ordered
      .withColumn("p", col("sz") - ((col("sz") + 1) / 2).cast("int") + 1)
      .select(col("doc_id"), col("sz"),
        explode(slice(col("shs"), lit(1), col("p"))).as("tok"))
    val nCand = pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select("a.doc_id", "b.doc_id").distinct().count()
    val nDocs = sh.count()
    val allPairs = nDocs * (nDocs - 1) / 2
    assert(nCand < allPairs / 100,
      s"prefix join produced $nCand candidates vs $allPairs all-pairs — " +
        "rarest-first ordering should prune >99% at this corpus")
  }
}
