package graft.operators

import graft.SparkSpec
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.functions._

/** Semantics of the dedup sketches (minhash / LSH / simhash) that the
  * driver can only rows-check: identity, sensitivity and recall against
  * exact Jaccard (q34 is the oracle-verified ground truth). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again today"
  private val docB = "the quick brown fox jumps over the lazy dog again and again tomorrow"
  private val docC = "completely different content about spark query engines and shuffles here"

  private def shingleDf = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    .select(col("doc_id"), TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))

  test("identical shingle sets -> identical minhash signatures; jaccard 1.0") {
    val df = Seq((1L, docA), (2L, docA)).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .select(col("doc_id"), HashFunctions.minhashSignature(col("sh"), 16).as("sig"))
    val sigs = df.orderBy("doc_id").select("sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 16)
  }

  test("near-identical docs collide in at least one LSH band; unrelated do not") {
    val sig = shingleDf.select(col("doc_id"),
      HashFunctions.minhashSignature(col("sh"), 16).as("sig"))
    val bands = sig.select(col("doc_id"),
        explode(HashFunctions.bandHashes(col("sig"), 8, 2)).as("bh"))
      .select(col("doc_id"), col("bh.band"), col("bh.bucket"))
    val cand = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)), s"near-dup pair not in candidates: $cand")
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)),
      s"unrelated doc collided in all-band check: $cand")
  }

  test("minhash signature agreement estimates jaccard") {
    val sig = shingleDf.select(col("doc_id"),
      HashFunctions.minhashSignature(col("sh"), 64).as("sig"))
    val rows = sig.orderBy("doc_id").select("sig").as[Seq[Long]].collect()
    val agree = rows(0).zip(rows(1)).count { case (a, b) => a == b } / 64.0
    val jac = shingleDf.alias("a").join(shingleDf.alias("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(TextFunctions.jaccard(col("a.sh"), col("b.sh"))).as[Double].head()
    assert(math.abs(agree - jac) < 0.25, s"minhash est $agree vs true $jac")
  }

  test("simhash: identical tokens -> distance 0; small edit -> small distance; unrelated -> large") {
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
      .select(col("doc_id"), HashFunctions.simhash64(TextFunctions.tokens(col("text"))).as("sh"))
    val m = df.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(m(a) ^ m(b))
    assert(ham(1, 1) == 0)
    assert(ham(1, 2) < 16, s"near-dup hamming ${ham(1, 2)}")
    assert(ham(1, 3) > ham(1, 2), s"unrelated ${ham(1, 3)} !> near ${ham(1, 2)}")
  }

  test("LSH candidates recover every exact-jaccard pair >= 0.5 at sf0.001") {
    val exact = SparkEntry_q34(sf0001).where(col("jac") >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = graft.SparkEntry.queries("q35_dedup_minhash_lsh")(spark, sf0001)
      .where(col("doc_a") < 300 && col("doc_b") < 300)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test needs at least one strong near-dup pair in the slice")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
  }

  private def SparkEntry_q34(d: String) =
    graft.SparkEntry.queries("q34_dedup_jaccard_pairs")(spark, d)

  // ---- q66: full-corpus fuzzy clustering -------------------------------

  /** Exact all-pairs confirmed edges over the FULL corpus — the edge set
    * q66's DuckDB oracle uses. Brute-force cross join: test-only (500
    * docs at sf0.001); the engine never runs this shape. */
  private def exactPairs(d: String, threshold: Double) = {
    val sh = graft.Tables.documents(spark, d)
      .select(col("doc_id"), TextFunctions.shinglesOfText(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    sh.alias("a").join(sh.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        TextFunctions.jaccard(col("a.sh"), col("b.sh")).as("jac"))
      .where(col("jac") >= threshold)
  }

  test("q66 oracle premise: full-corpus LSH edge set EQUALS exact all-pairs edges at j >= 0.5") {
    // Not just recall (supset) — the oracle mirrors the engine only if the
    // sketch-built edge set is exactly the exact-Jaccard one: no missed
    // pair (LSH false negative) and no extra pair (the confirm step
    // guarantees that side by construction).
    val exact = exactPairs(sf0001, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = DedupQueries.lshConfirmedPairs(graft.Tables.documents(spark, sf0001), 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test needs near-dup pairs in the corpus")
    assert(lsh == exact,
      s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("q91 LSH variant: equals the exact prefix-filter join on a recall-1.0 corpus") {
    // The documented trade (setsimJoinLsh Scaladoc): LSH candidates are
    // approximate in general, but on the shipped corpus — no pair mass in
    // the marginal [0.1, 0.8) band, per the recallPremiseGapPairs premise
    // q66 already pins — banding recall is effectively 1.0, so the cheap
    // variant must reproduce the exact join ROW FOR ROW, full schema
    // (inter_n/sz/jac confirm values included, not just the pair set).
    val docs = graft.Tables.documents(spark, sf0001)
    val exact = DedupQueries.prefixFilterPairs(docs).collect().toSeq
    val lsh = DedupQueries.setsimJoinLsh(docs, 0.5).collect().toSeq
    assert(exact.nonEmpty, "test needs qualifying pairs in the corpus")
    assert(lsh == exact,
      s"missed=${exact.diff(lsh)} extra=${lsh.diff(exact)}")
  }

  test("q137: chunks reconcile and chunk indexes are contiguous from 0") {
    val docs = graft.Tables.documents(spark, sf0001)
    val chunks = DedupQueries.cdcChunks(docs)
      .select("doc_id", "chunk_idx", "n_tokens")
      .as[(Long, Long, Long)].collect()
    val tokTotals = docs.select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    chunks.groupBy(_._1).foreach { case (doc, g) =>
      assert(g.map(_._3).sum == tokTotals(doc), s"doc $doc token loss")
      val idx = g.map(_._2).sorted
      assert(idx.toSeq == (0L until idx.length).toSeq,
        s"doc $doc chunk indexes not contiguous: ${idx.toSeq}")
    }
    assert(chunks.length > docs.count(),
      "the boundary rate must split at least some docs into multiple chunks")
  }

  test("q137: content-defined boundaries are SHIFT-RESISTANT — a prefix edit preserves later chunks") {
    // the defining CDC property, and exactly what whole-doc hashing lacks:
    // prepend tokens to a real doc; every chunk fully after the first
    // post-edit boundary must survive with an identical fingerprint
    val corpus = graft.Tables.documents(spark, sf0001)
    // pick a doc the chunker already splits >= 3 ways (the boundary rate
    // is content-dependent; the corpus has plenty of such docs)
    val richDoc = DedupQueries.cdcChunks(corpus)
      .groupBy("doc_id").agg(count(lit(1)).as("nc"))
      .where(col("nc") >= 3).orderBy("doc_id")
      .as[(Long, Long)].collect().headOption
      .getOrElse(fail("corpus has no >=3-chunk doc; lower the boundary mod"))._1
    val base = corpus
      .where(col("doc_id") === richDoc).select("doc_id", "text")
      .as[(Long, String)].collect().head._2
    val docs = Seq((0L, base), (1L, "zz qq " + base)).toDF("doc_id", "text")
    val ch = DedupQueries.cdcChunks(docs)
      .select("doc_id", "chunk_idx", "chunk_hash")
      .as[(Long, Long, Long)].collect()
    val a = ch.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    val b = ch.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(a.length >= 3, s"test needs a multi-chunk doc, got ${a.length} chunks")
    // all chunks of the original except (at most) the boundary-straddling
    // first ones reappear verbatim in the edited doc
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.length - 2,
      s"prefix edit must preserve later chunks: ${shared.size}/${a.length} survive")
    // and whole-doc hashing (q33's key) would share NOTHING: the full
    // fingerprints differ
    assert(a.toSeq != b.toSeq)
  }

  test("q141: no near-dup cluster straddles a split; singletons keep their q62 assignment") {
    val rows = graft.SparkEntry.queries("q141_leakage_safe_split")(spark, sf0001)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // the leakage guarantee: one split per cluster, by construction
    rows.groupBy(_._2).foreach { case (cl, g) =>
      assert(g.map(_._3).distinct.length == 1,
        s"cluster $cl straddles splits: ${g.map(_._3).distinct.toSeq}")
    }
    // multi-doc clusters must exist for the test to mean anything
    assert(rows.groupBy(_._2).exists(_._2.length > 1),
      "corpus needs at least one near-dup cluster")
    // a singleton's cluster_id is its own doc_id -> same hash stream as
    // q62's per-doc assignment (salt 0, 80/10/10)
    rows.filter(r => r._1 == r._2).foreach { case (id, _, split) =>
      val h = graft.functions.DeterministicHash.knuth32Local(id, graft.functions.DeterministicHash.splitSalt) % 100
      val want = if (h < 80) "train" else if (h < 90) "val" else "test"
      assert(split == want, s"doc $id: $split != $want")
    }
  }

  test("q143: savings reconcile with the cluster structure") {
    val rows = graft.SparkEntry.queries("q143_dedup_savings")(spark, sf0001)
      .select("source", "n_docs", "raw_tokens", "n_kept", "kept_tokens",
        "savings_frac")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._4 <= r._2 && r._5 <= r._3, s"kept cannot exceed raw: $r")
      // <= 1.0, not < 1.0: a source whose docs' cluster canonicals all
      // live in OTHER sources legitimately saves 100% of its tokens
      // (cross-source canonical attribution — see the q143 doc)
      assert(r._6 >= 0.0 && r._6 <= 1.0, s"savings range: $r")
    }
    val docs = graft.Tables.documents(spark, sf0001)
    assert(rows.map(_._2).sum == docs.count(), "every doc attributed once")
    // total kept docs = number of clusters
    val nClusters = DedupQueries.fuzzyFullClusters(docs)
      .select("cluster_id").distinct().count()
    assert(rows.map(_._4).sum == nClusters, "one kept doc per cluster")
    assert(rows.exists(_._6 > 0.0), "the corpus has near-dups; savings must show")
  }

  test("q66: clusters are well-formed (canonical = min member, sizes exact, edges intra-cluster)") {
    val docs = graft.Tables.documents(spark, sf0001)
    val rows = graft.SparkEntry.queries("q66_dedup_fuzzy_full")(spark, sf0001)
      .as[(Long, Long, Boolean, Long)].collect()
    assert(rows.length == docs.count(), "every doc gets a cluster row")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid label is not the min member")
      assert(members.forall(_._4 == members.length), s"cluster $cid size wrong")
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cid,
        s"cluster $cid canonical election wrong")
    }
    assert(byCluster.exists(_._2.length > 1), "corpus should yield at least one non-singleton")
    // every confirmed near-dup edge lands inside one cluster
    val label = rows.map(r => r._1 -> r._2).toMap
    val edges = DedupQueries.lshConfirmedPairs(docs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    edges.foreach { case (a, b) =>
      assert(label(a) == label(b), s"edge ($a,$b) split across clusters")
    }
  }

  // ---- q75: incremental (delta-vs-corpus) dedup ------------------------

  test("q75: all three tiers + exact-over-near precedence on a synthetic split") {
    val corpus = Seq(
      (10L, docA),                        // original of both the exact and near dups
      (11L, docA),                        // in-corpus exact copy — canonical must be min(10,11)=10
      (12L, docC)
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (100L, docA),                       // exact dup of 10/11 (also jac 1.0 — exact must win)
      (101L, docB),                       // near dup of docA (one-word edit)
      (102L, "totally novel text about incremental ingest tiers and deltas today"),
      (103L, "x y")                       // shingle-less (< 3 tokens): must be keep, not dropped
    ).toDF("doc_id", "text")
    val rows = DedupQueries.incrementalDedup(corpus, incoming)
      .as[(Long, String, Option[Long], Option[Double])].collect().toList
    assert(rows.map(_._1) == List(100L, 101L, 102L, 103L), s"row set wrong: $rows")
    val m = rows.map(r => r._1 -> r).toMap
    assert(m(100L) == ((100L, "exact_dup", Some(10L), Some(1.0))),
      s"exact tier wrong (precedence over the jac-1.0 fuzzy match): ${m(100L)}")
    assert(m(101L)._2 == "near_dup" && m(101L)._3.contains(10L), s"near tier wrong: ${m(101L)}")
    assert(m(101L)._4.exists(j => j >= 0.5 && j < 1.0), s"near jac out of range: ${m(101L)}")
    assert(m(102L) == ((102L, "keep", None, None)), s"keep tier wrong: ${m(102L)}")
    assert(m(103L) == ((103L, "keep", None, None)), s"shingle-less doc wrong: ${m(103L)}")
  }

  test("q75: near-dup best match is max jac with ties to the smallest corpus id") {
    // two corpus docs at different similarity to the incoming doc: the
    // closer one must be elected even though it has the larger doc_id
    val corpus = Seq(
      (1L, docA + " with plenty of extra trailing words appended here making it longer"),
      (2L, docA)
    ).toDF("doc_id", "text")
    val incoming = Seq((50L, docB)).toDF("doc_id", "text")
    val r = DedupQueries.incrementalDedup(corpus, incoming)
      .as[(Long, String, Option[Long], Option[Double])].head()
    assert(r._2 == "near_dup" && r._3.contains(2L), s"best-match election wrong: $r")
  }

  test("q75 oracle premise: asymmetric LSH cross-pairs EQUAL exact cross-pairs at j >= 0.5 (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf0001)
    val corpus = docs.where(col("doc_id") % 10 < 8)
    val incoming = docs.where(col("doc_id") % 10 >= 8)
    // brute-force cross join: test-only ground truth (the engine never
    // runs this shape — that is the point of the LSH probe)
    val exact = incoming
      .select(col("doc_id"), TextFunctions.shinglesOfText(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
      .crossJoin(corpus
        .select(col("doc_id").as("cand_id"),
          TextFunctions.shinglesOfText(col("text"), 3).as("sh_c"))
        .where(size(col("sh_c")) > 0))
      .select(col("doc_id"), col("cand_id"),
        TextFunctions.jaccard(col("sh"), col("sh_c")).as("jac"))
      .where(col("jac") >= 0.5)
      .select("doc_id", "cand_id").as[(Long, Long)].collect().toSet
    val lsh = DedupQueries.lshCrossPairs(corpus, incoming, 0.5)
      .select("doc_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test needs at least one cross-split near-dup pair")
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("q157: shared spans emit with exact doc frequency; singletons and intra-doc repeats don't inflate") {
    val span = "alpha bravo charlie delta echo foxtrot golf hotel"  // 8 tokens
    val docs = Seq(
      (10L, s"leading words $span trailing words"),         // carrier 1
      (20L, s"$span and then $span repeated in one doc"),    // carrier 2 — span occurs twice, counts ONCE
      (30L, "completely unrelated content with its own eight token run here today now")
    ).toDF("doc_id", "text")
    val rows = DedupQueries.spanDedup(docs, 8)
      .as[(String, Long, Long)].collect().toList
    // exactly the spans carried by >= 2 docs emit; every one has doc
    // frequency 2 and first carrier 10 or 20 — no span reaches doc 30
    assert(rows.nonEmpty, "the shared 8-token span must emit")
    assert(rows.forall(_._2 == 2L), s"doc frequency inflated: $rows")
    assert(rows.forall(r => r._3 == 10L || r._3 == 20L), s"first carrier wrong: $rows")
    // the full shared window family: docs 10 and 20 share ONLY windows
    // inside `span` itself (their contexts differ), which at width 8 is
    // exactly the one complete window
    assert(rows.size == 1, s"expected exactly the one complete shared window: $rows")
    val expectHash = docs.sparkSession.sql(
      s"SELECT md5(cast('$span' AS binary))").head().getString(0)
    assert(rows.head._1 == expectHash, s"span hash mismatch: ${rows.head}")
  }

  test("q166: provenance pair counts are the closed-form c*(c-1)/2 and c_a*c_b") {
    val span = "alpha bravo charlie delta echo foxtrot golf hotel"
    // srcA carries the span in 3 docs, srcB in 2, srcC never
    val docs = Seq(
      (1L, "srcA", s"$span one"),
      (2L, "srcA", s"$span two"),
      (3L, "srcA", s"$span three"),
      (4L, "srcB", s"$span four"),
      (5L, "srcB", s"$span five"),
      (6L, "srcC", "entirely different eight token content sits right here now ok")
    ).toDF("doc_id", "source", "text")
    val got = DedupQueries.spanProvenance(docs, 8)
      .as[(String, String, Long, Long)].collect().toList
    // within A: C(3,2)=3 pairs; within B: C(2,2)=1; cross A-B: 3*2=6;
    // srcC appears nowhere. One span drives every cell.
    assert(got == List(
      ("srcA", "srcA", 3L, 1L),
      ("srcA", "srcB", 6L, 1L),
      ("srcB", "srcB", 1L, 1L)), s"$got")
    // the matrix total equals the brute-force cross-document count:
    // 5 carriers -> C(5,2) = 10 sharing pairs
    assert(got.map(_._3).sum == 10L)
  }

  test("q36 audit: verdicts earned on the corpus, tiers populated, planted regression caught") {
    val docs = graft.Tables.documents(spark, sf0001)
    val rows = DedupQueries.simhashAudit(spark, docs)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // every tier row must EARN its oracle-pinned true verdict
    assert(rows.values.forall(_._5), s"verdict failed: ${rows.values.toList}")
    assert(rows.keySet == Set("exact", "near", "far"))
    // the separation verdict must be non-vacuous: the corpus carries
    // near pairs (planted near-dups) and far pairs (shared common
    // shingles) at sf0.001 - 28 and 11997 measured, pinned loosely
    assert(rows("near")._2 >= 5, s"near tier too thin: ${rows("near")}")
    assert(rows("far")._2 >= 1000, s"far tier too thin: ${rows("far")}")
    // and a BROKEN signature (constant zero) must fail it: mean
    // hamming becomes 0 == 0 on both tiers, the strict < is false
    val nNear = rows("near")._2
    val nFar = rows("far")._2
    assert(!(0L * nFar < 0L * nNear), "strict separation must reject a constant signature")
  }

  test("q258 impact: planted contamination costs the right source the right tokens") {
    // docs 0-4 are the benchmark. doc 10 (src1) repeats benchmark text
    // -> contaminated; doc 11 (src2) is clean.
    val bench = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (0L, bench, "benchsrc"), (1L, "unrelated benchmark row two ok", "benchsrc"),
      (2L, "third benchmark row is here now", "benchsrc"),
      (3L, "fourth benchmark row sits here too", "benchsrc"),
      (4L, "fifth benchmark row completes the set", "benchsrc"),
      (10L, s"$bench carried into training text", "src1"),
      (11L, "totally clean training document body", "src2")
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("q258").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupQueries.decontaminationImpact(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect().toList
    val m = got.map(r => r._1 -> r).toMap
    assert(m("src1")._3 == 1L && m("src1")._5 == m("src1")._4,
      s"src1 must lose all tokens: ${m("src1")}")
    assert(m("src2")._3 == 0L && m("src2")._6 == 1.0,
      s"src2 must keep everything: ${m("src2")}")
  }
}
