package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic anchors for q93 (bloom-pruned semi join) and q94 (sharded
  * inverted index): the bloom stage must prune without changing the
  * result even at absurd false-positive rates, and the index must be
  * lossless and bounded per shard.
  */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prune: confirmed rows equal the plain semi join exactly") {
    val facts = Tables.lineitem(spark, sf001)
    val keys = Tables.part(spark, sf001)
      .where(col("p_brand") === "Brand#4").select("p_partkey")
    val viaBloom = ExtendedQueries
      .bloomPrunedSemiAgg(facts, "l_partkey", keys, "p_partkey", 0.01)
      .count()
    val plain = facts.join(
      keys.withColumnRenamed("p_partkey", "l_partkey"),
      Seq("l_partkey"), "left_semi").count()
    assert(viaBloom == plain, "false positives must not survive the confirm")
    assert(plain > 0, "fixture predicate must select rows")
  }

  test("bloom prune: a sloppy filter (fpp 0.5) is still exact after confirm") {
    val facts = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("k")
    val keys = Seq(2L, 4L).toDF("pk")
    val out = ExtendedQueries
      .bloomPrunedSemiAgg(facts, "k", keys, "pk", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 4L))
  }

  test("bloom prune: null fact keys are dropped, never probed") {
    val facts = Seq(Some(1L), None, Some(2L)).toDF("k")
    val keys = Seq(1L).toDF("pk")
    val out = ExtendedQueries
      .bloomPrunedSemiAgg(facts, "k", keys, "pk", 0.01)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("bloom bits actually prune the fact scan before the join") {
    val facts = Tables.lineitem(spark, sf001)
    val keys = Tables.part(spark, sf001)
      .where(col("p_brand") === "Brand#4").select("p_partkey")
    val n = math.max(keys.count(), 1L)
    val bloom = keys.stat.bloomFilter("p_partkey", n, 0.01)
    val probe = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      new ExtendedQueries.BloomProbe(bos.toByteArray)
    }
    val might = udf((k: Long) => probe.might(k))
    val survivors = facts.where(might(col("l_partkey"))).count()
    val total = facts.count()
    val exact = facts.join(
      keys.withColumnRenamed("p_partkey", "l_partkey"),
      Seq("l_partkey"), "left_semi").count()
    assert(survivors >= exact, "bloom never loses a true match")
    assert(survivors < total / 5,
      s"bloom should prune a 5%-selective key set hard: $survivors of $total")
  }

  test("inverted index: lossless, doc-sorted, and bounded at 64 per shard") {
    val out = ExtendedQueries.invertedIndex(Tables.documents(spark, sf001))
      .orderBy("term", "shard").collect()
    assert(out.nonEmpty)
    var totalTf = 0L
    out.foreach { r =>
      val (df, cf) = (r.getLong(2), r.getLong(3))
      val postings = r.getSeq[org.apache.spark.sql.Row](4)
      assert(postings.length == df, "df_shard counts the posting entries")
      assert(postings.length <= 64, "shard bound is structural")
      val ids = postings.map(_.getLong(0))
      assert(ids == ids.sorted, "postings sorted by doc_id")
      val shard = r.getLong(1)
      assert(ids.forall(id => id / 64 == shard), "entries live in their shard")
      assert(cf == postings.map(_.getLong(1)).sum, "cf_shard sums the tfs")
      totalTf += cf
    }
    val corpusTokens = Tables.documents(spark, sf001)
      .select(sum(size(graft.functions.TextFunctions.tokens(col("text")))))
      .head().getLong(0)
    assert(totalTf == corpusTokens,
      "index is lossless: collection frequency sums to the corpus token count")
  }

  test("q94 catalog output serializes postings losslessly (no array columns)") {
    val catalog = SparkEntry.queries("q94_inverted_index")(spark, sf001)
    assert(catalog.schema("postings").dataType ==
      org.apache.spark.sql.types.StringType,
      "driver contract: postings must leave the engine as a scalar string")
    val rows = catalog.collect()
    val helper = ExtendedQueries.invertedIndex(Tables.documents(spark, sf001))
      .orderBy("term", "shard").collect()
    assert(rows.length == helper.length)
    rows.zip(helper).foreach { case (c, h) =>
      val parsed = c.getString(4).split(' ').toSeq.map { tok =>
        val Array(id, tf) = tok.split(':')
        (id.toLong, tf.toLong)
      }
      val orig = h.getSeq[org.apache.spark.sql.Row](4)
        .map(p => (p.getLong(0), p.getLong(1)))
      assert(parsed == orig, s"round-trip mismatch at ${c.getString(0)}")
    }
  }
}
