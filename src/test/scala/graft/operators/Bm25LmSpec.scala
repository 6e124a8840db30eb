package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic anchors for the q79 BM25 ranker and the q81 bigram-LM
  * quality scorer, on corpora small enough to check by hand.
  */
class Bm25LmSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed score on a two-doc corpus; ranking respects tf") {
    // doc 1: "spark spark x"  doc 2: "spark y y y"  doc 3: no hit
    val docs = Seq(
      (1L, "spark spark x"),
      (2L, "spark y y y"),
      (3L, "z z z")).toDF("doc_id", "text")
    val out = TextQueries.bm25TopK(docs, Seq("spark"), 10).collect()
    // doc 3 has no query term -> no tf row -> absent from the ranking
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // hand computation: N=3, avgdl=(3+4+3)/3, df=2, idf=(3-2+0.5)/(2+0.5)
    val avgdl = 10.0 / 3.0
    val idf = (3.0 - 2.0 + 0.5) / (2.0 + 0.5)
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
    val got = out.map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(math.abs(got(1L) - s(2, 3)) < 1e-12)
    assert(math.abs(got(2L) - s(1, 4)) < 1e-12)
    // higher tf at equal-ish dl outranks
    assert(got(1L) > got(2L))
  }

  test("bm25: multi-term scores sum per-term one-hot contributions") {
    val docs = Seq(
      (1L, "a b"), (2L, "a a"), (3L, "b b"), (4L, "c c")).toDF("doc_id", "text")
    val out = TextQueries.bm25TopK(docs, Seq("a", "b"), 10).collect()
    out.foreach { r =>
      val sa = Option(r.getAs[java.lang.Double]("s_a")).map(_.doubleValue).getOrElse(0.0)
      val sb = Option(r.getAs[java.lang.Double]("s_b")).map(_.doubleValue).getOrElse(0.0)
      assert(r.getAs[Double]("score") == sa + sb)
    }
    // doc 1 hits both terms; docs 2/3 hit one; doc 4 none
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(out.head.getLong(0) == 1L, "both-term doc ranks first")
  }

  test("bigram LM: smoothed conditional rows sum to 1 over the full vocab") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "b c a")).toDF("doc_id", "text")
    val model = TextQueries.bigramLmModel(docs).collect()
    val v = model.head.getAs[Long]("v")
    assert(v == 3) // vocab {a, b, c}
    // For each history w1: sum of observed smoothed p + unseen mass
    // (v - n_observed) * 1/(c1 + v) must close to exactly 1.
    model.groupBy(_.getString(0)).foreach { case (w1, rows) =>
      val c1 = rows.head.getAs[Long]("c1")
      val seen = rows.map(_.getAs[Double]("p")).sum
      val unseen = (v - rows.length) * (1.0 / (c1 + v))
      assert(math.abs(seen + unseen - 1.0) < 1e-12, s"P(.|$w1) sums to 1")
    }
  }

  test("bigram LM: per-doc mean is the hand value; short docs get NULL") {
    // corpus: "a b" x2 and "a c"; bigram counts: (a,b)=2, (a,c)=1; c1(a)=3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "a"), (5L, ""))
      .toDF("doc_id", "text")
    val out = TextQueries.bigramLmScores(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.getAs[java.lang.Double]("mean_p")))).toMap
    val v = 3.0 // vocab {a, b, c}
    assert(out(1L) == ((1L, Some((2 + 1) / (3 + v)))))
    assert(out(3L) == ((1L, Some((1 + 1) / (3 + v)))))
    assert(out(4L) == ((0L, None)), "1-token doc: no bigrams, NULL score")
    assert(out(5L) == ((0L, None)), "empty doc: no bigrams, NULL score")
    // repeated common transition scores higher than the rare one
    assert(out(1L)._2.get > out(3L)._2.get)
  }

  test("token diversity: hand values for degenerate, uniform, and empty docs") {
    val docs = Seq(
      (1L, "x x x x"),          // one token: simpson 0, top_share 1
      (2L, "a b c d"),          // uniform: conc = 4*(1/4)^2 -> simpson 3/4
      (3L, "a a b"),            // conc = (2/3)^2 + (1/3)^2 = 5/9
      (4L, "")).toDF("doc_id", "text")
    val out = TextQueries.tokenDiversity(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.getAs[java.lang.Double]("simpson")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("top_share")).map(_.doubleValue)))
      .toMap
    assert(out(1L) == ((4L, 1L, Some(0.0), Some(1.0))))
    assert(out(2L) == ((4L, 4L, Some(0.75), Some(0.25))))
    val (n3, d3, s3, t3) = out(3L)
    assert(n3 == 3L && d3 == 2L)
    assert(math.abs(s3.get - 4.0 / 9.0) < 1e-15 && t3.get == 2.0 / 3.0)
    assert(out(4L) == ((0L, 0L, None, None)), "token-less doc: NULL scores")
  }

  test("bigram LM on the real corpus: every scored doc in (0,1); join-back total") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = TextQueries.bigramLmScores(docs)
    assert(out.count() == docs.count(), "left join keeps every document")
    val bad = out.where(col("n_bigrams") > 0 &&
      (col("mean_p") <= 0.0 || col("mean_p") >= 1.0)).count()
    assert(bad == 0, "smoothed mean transition probability lies in (0,1)")
  }

  test("q162: RRF fusion equals a first-principles fuse of the two legs") {
    // lexical leg: the shipped BM25 ranking cut at 50
    val lex = TextQueries
      .bm25TopK(graft.Tables.documents(spark, sf0001),
        Seq("spark", "join", "stream"), 50)
      .select("doc_id", "rnk").as[(Long, Long)].collect().toMap
    // dense leg: brute-force cosine vs vec 0, replicating the engine's
    // index-ordered left folds (0.0 seed) so ranks match bit-for-bit
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def nrm(v: Seq[Double]) = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    val (q, qn) = (vecs(0L), nrm(vecs(0L)))
    val dense = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val dot = q.indices.foldLeft(0.0)((a, i) => a + q(i) * v(i))
      id -> dot / (qn * nrm(v))
    }.sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val expected = (lex.keySet ++ dense.keySet).toSeq.map { id =>
      val rrf = lex.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      (id, rrf)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = graft.SparkEntry
      .queries("q162_hybrid_retrieval_rrf")(spark, sf0001)
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Long]("lex_rnk")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("dense_rnk")).map(_.longValue),
        r.getDouble(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == expected.map(_._1),
      s"fused order diverges:\n${got.toSeq}\n$expected")
    got.foreach { case (id, lr, dr, rrf, _) =>
      assert(lr == lex.get(id) && dr == dense.get(id),
        s"leg ranks for doc $id")
      assert(rrf == expected.find(_._1 == id).get._2,
        s"rrf score for doc $id must be the exact two-division sum")
    }
    // the fusion must actually mix: at least one doc from each leg only
    assert(got.exists(g => g._2.isEmpty && g._3.nonEmpty),
      "no dense-only doc in the top-10 — fusion degenerate")

    // q168's agreement audit must reconcile with the same two legs
    val agree = graft.SparkEntry
      .queries("q168_rank_agreement")(spark, sf0001).head()
    val inter = lex.keySet & dense.keySet
    assert(agree.getLong(1) == inter.size.toLong, "overlap_50")
    assert(agree.getLong(0) ==
      inter.count(id => lex(id) <= 10 && dense(id) <= 10).toLong,
      "overlap_10")
    assert(agree.getLong(2) ==
      inter.toSeq.map(id => math.abs(lex(id) - dense(id))).sum,
      "footrule_sum")
    assert(agree.getLong(3) == (lex.keySet -- dense.keySet).size.toLong &&
      agree.getLong(4) == (dense.keySet -- lex.keySet).size.toLong,
      "exclusive counts")
  }
}
