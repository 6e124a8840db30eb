package graft.functions

import graft.SparkSpec
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** DedupIndexStore: miss-build-hit lifecycle, probe parity between the
  * loaded index and the inline build, content-keyed invalidation, and
  * rejection of torn/drifted entries. */
class DedupIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = java.nio.file.Files.createTempDirectory(
    java.nio.file.Paths.get("target"), "dedup-store").toString

  private def corpus = graft.Tables.documents(spark, sf0001)
    .where(col("doc_id") % 10 < 8).select("doc_id", "text")
  private def delta = graft.Tables.documents(spark, sf0001)
    .where(col("doc_id") % 10 >= 8)

  test("miss builds and persists; second call hits; probe equals the inline plan") {
    val dir = freshDir()
    val (n, fp) = DedupIndexStore.fingerprint(corpus)
    val key = DedupIndexStore.contentKey(n, fp)
    val (idx1, hit1) = DedupIndexStore.loadOrBuild(spark, corpus, key, dir)
    assert(!hit1, "first call must be a build")
    val (idx2, hit2) = DedupIndexStore.loadOrBuild(spark, corpus, key, dir)
    assert(hit2, "second call must load the persisted index")

    val expected = DedupQueries.incrementalDedup(corpus, delta)
      .as[(Long, String, Option[Long], Option[Double])].collect().toList
    Seq(idx1, idx2).foreach { idx =>
      val got = DedupQueries.incrementalDedupIndexed(idx, delta)
        .as[(Long, String, Option[Long], Option[Double])].collect().toList
      assert(got == expected, "indexed probe must equal the inline q75 plan")
    }
    assert(expected.exists(_._2 == "near_dup"), "split must cross a near-dup")
  }

  test("the content key moves when the corpus does") {
    val (n1, fp1) = DedupIndexStore.fingerprint(corpus)
    val (n2, fp2) = DedupIndexStore.fingerprint(
      corpus.withColumn("text", concat(col("text"), lit(" drifted"))))
    assert(DedupIndexStore.contentKey(n1, fp1) != DedupIndexStore.contentKey(n2, fp2),
      "doc content change must move the fingerprint")
    val reordered = DedupIndexStore.fingerprint(corpus.orderBy(col("doc_id").desc))
    assert((n1, fp1) == reordered, "fingerprint must be order-independent")
  }

  test("a torn entry (missing _SUCCESS) is rejected and rebuilt, not trusted") {
    val dir = freshDir()
    val key = "fixedkey_n1"
    DedupIndexStore.loadOrBuild(spark, corpus, key, dir)
    val marker = java.nio.file.Paths.get(dir, s"dedup_v${DedupIndexStore.indexFormatVersion}_$key",
      "band", "_SUCCESS")
    java.nio.file.Files.delete(marker)
    val (idx, hit) = DedupIndexStore.loadOrBuild(spark, corpus, key, dir)
    assert(!hit, "torn entry must read as a miss")
    assert(java.nio.file.Files.exists(marker), "rebuild must republish a complete entry")
    assert(DedupQueries.incrementalDedupIndexed(idx, delta).count() == delta.count())
  }

  test("a count-drifted table is rejected by the meta check") {
    val dir = freshDir()
    val key = "fixedkey_n2"
    DedupIndexStore.loadOrBuild(spark, corpus, key, dir)
    val hashDir = java.nio.file.Paths.get(dir,
      s"dedup_v${DedupIndexStore.indexFormatVersion}_$key", "hash").toString
    // truncate the hash table in place (keeps schema + _SUCCESS): counts
    // no longer match meta, so a load must fall back to rebuild
    val one = spark.read.parquet(hashDir).limit(1).collect()
    spark.createDataFrame(spark.sparkContext.parallelize(one.toSeq),
        spark.read.parquet(hashDir).schema)
      .write.mode("overwrite").parquet(hashDir)
    // the overwrite commits normally (fresh _SUCCESS), so ONLY the
    // meta-count check can catch the drift
    val (_, hit) = DedupIndexStore.loadOrBuild(spark, corpus, key, dir)
    assert(!hit, "count drift must read as a miss and trigger a rebuild")
  }
}
