package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q126 vocabulary coverage + q127 term burstiness: semantic anchors
  * beyond the DuckDB hash gate — monotonicity/saturation of the curve,
  * and the closed-form burstiness against a direct per-doc computation. */
class VocabStatsSpec extends SparkSpec {
  import spark.implicits._

  test("q126: coverage is monotone in k and saturates at exactly 1.0") {
    val rows = graft.SparkEntry.queries("q126_vocab_coverage")(spark, sf001)
      .select("k", "vocab_used", "covered", "total", "coverage")
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._5, s"coverage must be nondecreasing: $a -> $b")
      assert(a._2 <= b._2, "vocab_used must be nondecreasing")
    }
    val total = rows.head._4
    assert(rows.forall(_._4 == total), "total is a corpus constant")
    // once k >= |vocab|, the curve saturates: covered == total, coverage 1.0
    val sat = rows.filter(r => r._2 < r._1)
    assert(sat.nonEmpty, "the largest cutoffs must exceed the test vocabulary")
    sat.foreach { r =>
      assert(r._3 == total && r._5 == 1.0, s"saturated row must cover all: $r")
    }
  }

  test("q126: covered at k equals the sum of the k most frequent terms") {
    val docs = graft.Tables.documents(spark, sf0001)
    val freqs = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect()
      .sortBy { case (t, f) => (-f, t) }.map(_._2)
    val rows = TextQueries.vocabCoverage(docs, Seq(1, 3, 7))
      .select("k", "covered").as[(Int, Long)].collect().toMap
    for (k <- Seq(1, 3, 7))
      assert(rows(k) == freqs.take(k).sum,
        s"covered(k=$k) != top-$k frequency sum")
  }

  test("q142: deciles balance, cumulatives are monotone, the full cut covers everything") {
    val docs = graft.Tables.documents(spark, sf001)
    val rows = TextQueries.qualityBudgetCurve(docs)
      .select("decile", "n_docs", "min_quality", "cum_docs", "cum_tokens",
        "token_share")
      .as[(Long, Long, Double, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L).toSeq, "all ten deciles")
    val total = docs.count()
    assert(rows.map(_._2).sum == total, "every doc in exactly one decile")
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "ntile balance")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 > a._4 && b._5 >= a._5, s"cumulatives monotone: $a -> $b")
      assert(b._3 <= a._3 + 1e-15,
        s"best-first: min_quality nonincreasing: $a -> $b")
    }
    assert(rows.last._4 == total && rows.last._6 == 1.0,
      "the decile-10 cut is the whole corpus")
  }

  test("q127: burstiness matches a direct zero-inclusive VMR computation") {
    val docs = graft.Tables.documents(spark, sf0001)
    val nDocs = docs.count()
    val got = TextQueries.termBurstiness(docs, topK = 5)
      .select("term", "f", "s2", "n_docs", "burstiness")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty && got.forall(_._4 == nDocs))
    // recompute per term from raw per-doc counts, zeros included
    val counts = docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3) }
    got.foreach { case (term, f, s2, n, b) =>
      val cs = counts(term)
      assert(cs.sum == f && cs.map(c => c * c).sum == s2,
        s"moment mismatch for $term")
      val mean = f.toDouble / n
      val varS = (s2 - f.toDouble * f / n) / (n - 1)
      assert(math.abs(b - varS / mean) < 1e-9 * math.max(1.0, b),
        s"$term: closed form $b != direct ${varS / mean}")
    }
    // frequency-desc output order with term tiebreak
    got.sliding(2).foreach { case Array(a, b2) =>
      assert(a._2 > b2._2 || (a._2 == b2._2 && a._1 < b2._1),
        "output must be (f desc, term asc)")
    }
  }

  test("q159: pair counts equal hand-computed merges; 1-char words drop; order is (freq desc, pair)") {
    // vocab: ab x2, abc x2, bc x1, and a 1-char word that must not count
    // pair totals: 'ab' = 2 (from ab) + 2 (from abc) = 4
    //              'bc' = 2 (from abc) + 1 (from bc)  = 3
    val docs = Seq(
      (1L, "ab ab abc a"),
      (2L, "abc bc")).toDF("doc_id", "text")
    val got = TextQueries.bpeMergeCandidates(docs, 50)
      .as[(String, Long)].collect().toList
    assert(got == List(("ab", 4L), ("bc", 3L)), s"$got")
    // k truncates on the (freq desc, pair asc) total order
    val top1 = TextQueries.bpeMergeCandidates(docs, 1)
      .as[(String, Long)].collect().toList
    assert(top1 == List(("ab", 4L)), s"$top1")
  }

  test("q164: per-lang totals reconcile with q63's per-doc rows; ratios are the total divisions") {
    // q63 emits per-doc (lang, n_bpe_tokens, n_ws_tokens) with the SAME
    // tokenizer pair; q164's lang totals must be exactly their sums
    val perDoc = graft.SparkEntry.queries("q63_bpe_token_count")(spark, sf0001)
      .select("lang", "n_bpe_tokens", "n_ws_tokens")
      .as[(String, Long, Long)].collect()
    val byLang = perDoc.groupBy(_._1).view.mapValues(rs =>
      (rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum)).toMap
    val got = graft.SparkEntry
      .queries("q164_tokenizer_parity_by_lang")(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSet == byLang.keySet)
    got.foreach { r =>
      val lang = r.getString(0)
      val (nDocs, nBpe, nWords) = byLang(lang)
      assert(r.getLong(1) == nDocs && r.getLong(4) == nBpe &&
        r.getLong(5) == nWords, s"$lang totals diverge from q63's rows")
      assert(r.getLong(2) >= r.getLong(3),
        s"$lang: UTF-8 bytes >= codepoints always")
      assert(r.getDouble(6) == r.getLong(2).toDouble / nBpe.toDouble,
        s"$lang bytes_per_token must be the exact total division")
      assert(r.getDouble(7) == nBpe.toDouble / nWords.toDouble,
        s"$lang fertility must be the exact total division")
    }
  }

  test("q179 vocab growth: exact hand curve and corpus monotonicity laws") {
    // doc 0: "a b", doc 1: "b c", doc 2: "a", doc 3: "d d"
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, "a"), (3L, "d d"))
      .toDF("doc_id", "text")
    val got = TextQueries.vocabGrowth(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // cp: (n_docs, total_tokens, n_types, ttr_micro)
    assert(got.take(4) == List(
      (1L, 1L, 2L, 2L, 1000000L), // a b
      (2L, 2L, 4L, 3L, 750000L), // + b c
      (4L, 4L, 7L, 4L, 571428L), // + a, + d d
      (8L, 4L, 7L, 4L, 571428L)), s"$got") // saturated
    assert(got.length == 14 && got.drop(2).forall(_._3 == 7L))
    // real corpus: types and tokens are monotone, types <= tokens,
    // and the curve saturates once every doc is inside the threshold
    val cur = graft.SparkEntry.queries("q179_vocab_growth")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    cur.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4, s"$a -> $b")
    case _ => }
    assert(cur.forall(r => r._4 <= r._3), "types can never exceed tokens")
    assert(cur.last._2 == 500L, "all docs inside the final checkpoint")
  }
}
