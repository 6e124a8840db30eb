package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Vector-similarity semantics + ANN recall of the LSH variant against
  * the exact brute-force baseline (q38 is oracle-verified). */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: self = 1.0, orthogonal = 0.0, opposite = -1.0") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f), Array(-1.0f, 0.0f))).toDF("id", "a", "b")
    val got = df.select(col("id"), cosine(col("a"), col("b")).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0 && got(2L) == 0.0 && got(3L) == -1.0)
  }

  test("hyperplane code is deterministic and in range for k planes") {
    val planes = makePlanes(8, 64)
    val df = graft.Tables.embeddings(spark, sf0001).limit(50)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("vec_id"), hyperplaneCode(col("v"), planes).as("code"))
    val codes = df.as[(Long, Long)].collect()
    assert(codes.forall { case (_, c) => c >= 0 && c < 256 })
    val again = df.as[(Long, Long)].collect()
    assert(codes.toSeq == again.toSeq)
  }

  test("ANN-LSH results are a subset of correct cosine scores (vs exact baseline)") {
    val exact = graft.SparkEntry.queries("q38_ann_bruteforce_topk")(spark, sf0001)
      .select(col("qid"), col("vid"), col("cos")).as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    // full exact scores for any (query, candidate) the LSH emits
    val lsh = SimilarityQueries.lshTopK(spark, sf0001, 4, 8, 2)
      .select(col("qid"), col("vid"), col("cos")).as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "LSH returned no candidates at sf0.001")
    // where LSH picked a pair the exact top-5 also contains, scores agree exactly
    val overlap = lsh.filter { case (q, v, _) => exact.contains((q, v)) }
    overlap.foreach { case (q, v, c) => assert(c == exact((q, v)), s"score mismatch ($q,$v)") }
  }

  test("per-query LSH output is at most top-5 and rank-ordered") {
    val rows = SimilarityQueries.lshTopK(spark, sf0001, 4, 8, 2)
      .select(col("qid"), col("rnk"), col("cos")).as[(Long, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= 5)
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted(Ordering[Double].reverse).toSeq)
    }
  }

  test("IVF ANN returns valid cells and exact scores vs brute-force baseline") {
    val exact = graft.SparkEntry.queries("q38_ann_bruteforce_topk")(spark, sf0001)
      .select(col("qid"), col("vid"), col("cos")).as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    val ivf = SimilarityQueries.ivfTopKAuto(spark, sf0001)
      .select(col("qid"), col("vid"), col("cos")).as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty, "IVF returned no candidates")
    // every score the IVF path computed must equal the exact cosine when
    // the pair also appears in the exact top-5
    ivf.filter { case (q, v, _) => exact.contains((q, v)) }
      .foreach { case (q, v, c) => assert(c == exact((q, v)), s"score mismatch ($q,$v)") }
    // per-query at most 5 results
    ivf.groupBy(_._1).foreach { case (_, g) => assert(g.length <= 5) }
  }

  test("banded multi-probe LSH recall@5 >= 0.5 against the exact baseline") {
    val exact = graft.SparkEntry.queries("q38_ann_bruteforce_topk")(spark, sf0001)
      .select(col("qid"), col("vid")).as[(Long, Long)].collect().toSet
    val lsh = SimilarityQueries.lshTopK(spark, sf0001, 4, 8, 2)
      .select(col("qid"), col("vid")).as[(Long, Long)].collect().toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    info(s"banded multi-probe LSH recall@5 = $recall (${(exact & lsh).size}/${exact.size})")
    assert(recall >= 0.5,
      s"banded LSH recall@5 = $recall below the 0.5 design floor")
    // and the CATALOG q39 audit row must earn its pinned verdict here too
    val audit = graft.SparkEntry.queries("q39_ann_lsh_bucketed")(spark, sf0001)
    assert(audit.where(!col("recall_floor_met")).count() == 0L,
      "q39 recall_floor_met verdict not earned at sf0.001")
  }

  test("IVF (trained centroids) recall@5 >= 0.6 against the exact baseline") {
    val exact = graft.SparkEntry.queries("q38_ann_bruteforce_topk")(spark, sf0001)
      .select(col("qid"), col("vid")).as[(Long, Long)].collect().toSet
    val ivf = SimilarityQueries.ivfTopKAuto(spark, sf0001)
      .select(col("qid"), col("vid")).as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall (${(exact & ivf).size}/${exact.size})")
    assert(recall >= 0.6, s"IVF recall@5 = $recall below the 0.6 design floor")
    // and the CATALOG q47 audit row must earn its pinned verdict here
    // too — since r13 that verdict is the CERTIFIED 0.7 floor (auto-
    // escalating probe budget), matching q39
    val audit = graft.SparkEntry.queries("q47_ann_ivf")(spark, sf0001)
    assert(audit.where(!col("recall_floor_met")).count() == 0L,
      "q47 certified 0.7 recall verdict not earned at sf0.001")
  }

  test("certified IVF earns the 0.7 floor at sf0.001 and escalation terminates") {
    val exact = graft.SparkEntry.queries("q38_ann_bruteforce_topk")(spark, sf0001)
      .select(col("qid"), col("rnk"), col("vid"))
    val (ivf, nHit, nExact) =
      SimilarityQueries.ivfTopKCertified(spark, sf0001, exact)
    assert(nExact > 0L)
    assert(nHit * 10L >= nExact * 7L,
      s"certified recall ${nHit.toDouble / nExact} below 0.7 at sf0.001")
    // the certified frame is the one the counts describe
    val got = ivf.select(col("qid"), col("vid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = exact.select(col("qid"), col("vid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((ex & got).size.toLong == nHit)
  }

  test("IVF recall@5 >= 0.6 holds at the sf0.1 AUTO operating point (2k corpus, 45 cells)") {
    // The round-3 regression this guards: chooseNProbeFor's small-corpus
    // scan floor was dropped and the sf0.1 auto point silently fell to
    // recall 0.48 — visible only in AnnTradeoff output, not the suite.
    // sf0.001's 500-vector corpus cannot catch it (different k/floor
    // regime), so assert at the N=2000 point the driver actually benches.
    val sf01 = "/root/testdata/sf0.1"
    val exact = graft.SparkEntry.queries("q38_ann_bruteforce_topk")(spark, sf01)
      .select(col("qid"), col("vid")).as[(Long, Long)].collect().toSet
    val ivf = SimilarityQueries.ivfTopKAuto(spark, sf01)
      .select(col("qid"), col("vid")).as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@5 at sf0.1 auto point = $recall (${(exact & ivf).size}/${exact.size})")
    assert(recall >= 0.6,
      s"IVF recall@5 = $recall below the 0.6 floor at the sf0.1 auto operating point")
    // the catalog audit's pinned verdict must hold at this point too —
    // and since r13 it is the CERTIFIED 0.7 floor (the sf0.1 auto point
    // measures 0.66 raw, so this exercises the escalation path)
    val audit = graft.SparkEntry.queries("q47_ann_ivf")(spark, sf01)
    assert(audit.where(!col("recall_floor_met")).count() == 0L,
      "q47 certified 0.7 recall verdict not earned at the sf0.1 auto point")
  }

  test("banded codes equal the composed per-band hyperplane code") {
    val bands = 4
    val r = 8
    val planes = makePlanes(bands * r, 64)
    val base = graft.Tables.embeddings(spark, sf0001).limit(50)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val native = base
      .select(col("vec_id"), bandedHyperplaneCodes(col("v"), planes, bands).as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    (0 until bands).foreach { b =>
      val composed = base
        .select(col("vec_id"),
          hyperplaneCode(col("v"), planes.slice(b * r, (b + 1) * r)).as("code"))
        .as[(Long, Long)].collect()
      composed.foreach { case (id, code) =>
        assert(native(id)(b) == code, s"band $b mismatch for vec $id")
      }
    }
  }

  test("nearest_cells returns the argmax-by-dot cells in order") {
    // 2-d unit centroids at 0, 90, 180, 270 degrees
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0), Array(0.0, -1.0))
    val df = Seq(
      (1L, Array(0.9, 0.1)),   // nearest: 0 then 1
      (2L, Array(-0.3, -0.8)), // nearest: 3 then 2
      (3L, Array(0.5, 0.5))    // tie 0/1 -> lower cell first
    ).toDF("id", "v")
    val got = df.select(col("id"), nearestCells(col("v"), cents, 2).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) == Seq(0, 1), got(1L).toString)
    assert(got(2L) == Seq(3, 2), got(2L).toString)
    assert(got(3L) == Seq(0, 1), got(3L).toString)
  }

  test("wrong-width vectors fail loudly instead of silently truncating") {
    // A 3-d input against a 2-d centroid/plane table must raise, not
    // assign plausible-but-wrong cells from a truncated dot product.
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val bad = Seq((1L, Array(0.9, 0.1, 0.5))).toDF("id", "v")
    val e1 = intercept[Exception] {
      bad.select(nearestCells(col("v"), cents, 1)).collect()
    }
    assert(e1.getMessage.contains("dimensional") || e1.getCause.getMessage.contains("dimensional"))
    val e2 = intercept[Exception] {
      bad.select(bandedHyperplaneCodes(col("v"), cents.toSeq, 2)).collect()
    }
    assert(e2.getMessage.contains("dimensional") || e2.getCause.getMessage.contains("dimensional"))
  }

  test("probeMasks enumerates exactly the hamming<=depth ball") {
    val masks = makeProbeCheck(8, 2)
    assert(masks.length == 1 + 8 + 28)
    assert(masks.distinct.length == masks.length)
    assert(masks.forall(m => java.lang.Long.bitCount(m) <= 2))
    assert(masks.head == 0L)
  }
  private def makeProbeCheck(bits: Int, depth: Int): Seq[Long] = probeMasks(bits, depth)

  test("trainCentroids handles sparse/offset ids and honors the hard sample cap") {
    // all-odd ids: a naive `id % stride == 0` sampler would select nothing
    val sparse = graft.Tables.embeddings(spark, sf0001)
      .select((col("vec_id") * 2 + 1).as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val cents = graft.functions.AnnIndex.trainCentroids(
      sparse, "vec_id", "v", k = 8, iterations = 3, sampleCap = 100)
    assert(cents.length == 8)
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid not normalized: $n")
    }
    // determinism
    val again = graft.functions.AnnIndex.trainCentroids(
      sparse, "vec_id", "v", k = 8, iterations = 3, sampleCap = 100)
    assert(cents.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)

    // the sample cap is a HARD bound: find a cap where the hash-stride
    // selection overshoots (deterministic for fixed data) and assert the
    // limit clips it to exactly sampleCap rows
    import org.apache.spark.sql.functions.{pmod, xxhash64, lit => slit}
    val n = sparse.count()
    val overshooting = Seq(3, 5, 8, 13, 21, 34, 55).find { cap =>
      val stride = math.max(1L, (n + cap - 1) / cap)
      sparse.where(pmod(xxhash64(col("vec_id")), slit(stride)) === 0).count() > cap
    }
    assert(overshooting.nonEmpty, "no cap overshoots on this corpus — widen the probe list")
    val cap = overshooting.get
    assert(graft.functions.AnnIndex.trainingSample(sparse, "vec_id", "v", cap).length == cap)
  }

  test("q57 centroids and outlier ranking match a local reference computation") {
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, String, Seq[Double])].collect()
    // Local reference mirrors the engine's quantized exact centroid: sum
    // the 2^-24-unit integers (exact in a double while < 2^53 — here
    // |u| <= ~2^27 * 500 rows, far under), then the engine's division
    // sequence. The engine's lo/hi long split-sum combines to exactly
    // this total, so the comparison is bit-level, not tolerance-level.
    val expected = vecs.groupBy(_._2).flatMap { case (label, rows) =>
      val dim = rows.head._3.length
      val cent = (0 until dim).map { j =>
        val unitSum = rows.map(r => math.floor(r._3(j) * 16777216.0 + 0.5)).sum
        (unitSum / 16777216.0) / rows.length
      }
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      rows.toSeq.map(r => (label, r._1, cos(r._3, cent)))
        .sortBy(r => (r._3, r._2)).take(3)
    }.toSeq.sortBy(r => (r._1, r._3))

    val got = graft.SparkEntry.queries("q57_label_centroid_outliers")(spark, sf0001)
      .select(col("label"), col("vec_id"), col("cos_to_centroid"))
      .as[(String, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._3))

    assert(got.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)),
      s"outlier sets differ:\n got=$got\n exp=$expected")
    got.zip(expected).foreach { case ((_, _, g), (_, _, e)) =>
      assert(g == e, s"cosine $g vs local $e (quantized centroids must agree bit-for-bit)")
    }
    // sanity: the quantized centroid stays within half a unit of the true
    // mean per coordinate (2^-25 per summed element)
    val trueMeans = vecs.groupBy(_._2).map { case (label, rows) =>
      label -> (0 until rows.head._3.length).map(j => rows.map(_._3(j)).sum / rows.length)
    }
    vecs.groupBy(_._2).foreach { case (label, rows) =>
      val cent = (0 until rows.head._3.length).map { j =>
        val unitSum = rows.map(r => math.floor(r._3(j) * 16777216.0 + 0.5)).sum
        (unitSum / 16777216.0) / rows.length
      }
      cent.zip(trueMeans(label)).foreach { case (q, t) =>
        assert(math.abs(q - t) <= math.pow(2, -25) + 1e-12,
          s"quantized centroid drifted past half a unit from the true mean: $q vs $t")
      }
    }
  }

  test("approx_count_distinct within its 2% design error vs exact") {
    // the raw estimate (q46's catalog row now reduces it to the audit
    // verdict — keep the estimate itself anchored here)
    val rows = graft.Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey", 0.02).as("approx_parts"),
        countDistinct("l_partkey").as("exact_parts"))
      .select(col("approx_parts"), col("exact_parts")).as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.10, s"HLL err $err (approx=$approx exact=$exact)")
    }
    // and the catalog row's in-plan audit must agree
    val audit = graft.SparkEntry.queries("q46_approx_count_distinct")(spark, sf001)
      .select(col("hll_within_10pct")).as[Boolean].collect()
    assert(audit.nonEmpty && audit.forall(identity))
  }

  // ------------------------------------------------------------ q72 SemDeDup

  private def collectVectors(dir: String): Array[(Long, Array[Double], Double)] =
    graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (id, v) =>
        (id, v.toArray, math.sqrt(v.map(x => x * x).sum))
      }

  /** Plain-Scala SemDeDup: argmax-dot assignment against unit centroids
    * (ties to the lowest sid), then greedy keep-lowest-id within each
    * cluster at cosine >= tau. */
  private def referenceDedup(vecs: Array[(Long, Array[Double], Double)],
      cents: Array[(Long, Array[Double])], tau: Double): Map[Long, (Long, Boolean)] = {
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    val cluster = vecs.map { case (id, v, _) =>
      id -> cents.maxBy { case (sid, cv) => (dot(v, cv), -sid) }._1
    }.toMap
    val byCluster = vecs.groupBy { case (id, _, _) => cluster(id) }
    vecs.map { case (id, v, n) =>
      val mates = byCluster(cluster(id))
      val dropped = mates.exists { case (oid, ov, on) =>
        oid < id && dot(v, ov) / (n * on) >= tau
      }
      id -> (cluster(id), !dropped)
    }.toMap
  }

  test("q72 semantic dedup matches the plain-Scala reference exactly") {
    val vecs = collectVectors(sf0001)
    val cents = vecs.takeWhile(_._1 < 16).map { case (id, v, n) =>
      (id, v.map(_ / n))
    }
    val want = referenceDedup(vecs, cents, 0.35)
    val got = graft.SparkEntry.queries("q72_semantic_dedup")(spark, sf0001)
      .as[(Long, Long, Boolean)].collect()
    assert(got.length == vecs.length, "one verdict per vector")
    got.foreach { case (id, cl, kept) =>
      assert(want(id) == ((cl, kept)), s"vec $id: got ($cl,$kept), want ${want(id)}")
    }
    assert(got.exists(!_._3), "corpus has near-dups; something must drop")
  }

  test("semantic dedup holds its greedy-election contract under TRAINED centroids") {
    // The production path: Lloyd centroids from AnnIndex instead of the
    // oracle's seed vectors. The operator's semantics must be exactly the
    // same greedy election relative to whatever assignment it produced.
    val corpus = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", graft.functions.VectorFunctions.norm2(col("v")))
    val raw = graft.functions.AnnIndex.trainCentroids(
      corpus, "vec_id", "v", k = 8, iterations = 5)
    val cents = raw.zipWithIndex.map { case (c, i) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      (i.toLong, c.map(_ / n))
    }
    val got = SimilarityQueries.semanticDedup(corpus, cents, tau = 0.35)
      .as[(Long, Long, Boolean)].collect()
    val vecs = collectVectors(sf0001)
    val want = referenceDedup(vecs, cents, 0.35)
    got.foreach { case (id, cl, kept) =>
      assert(want(id) == ((cl, kept)),
        s"trained-centroid vec $id: got ($cl,$kept), want ${want(id)}")
    }
    // trained clusters group near-dups at least as well as raw seeds do
    val seedDrops = referenceDedup(vecs,
      vecs.takeWhile(_._1 < 16).map { case (id, v, n) => (id, v.map(_ / n)) },
      0.35).count(!_._2._2)
    assert(got.count(!_._3) >= seedDrops,
      "trained centroids must not lose near-dup recall vs seed blocking")
  }

  test("q176 matryoshka: BigInt brute-force reference on the tiny corpus") {
    import spark.implicits._
    // values are multiples of 2^-4, so round(x*2^20) is exact on any
    // engine — the reference below needs no rounding-mode modelling
    val rnd = new scala.util.Random(20260814L)
    def vec(): Array[Float] =
      Array.fill(64)((rnd.nextInt(33) - 16) / 16.0f)
    val n = 24
    val vecs = (0 until n).map(i => (i.toLong, vec()))
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimilarityQueries.matryoshkaFidelity(df, 16, 10)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // reference: exact integer dots, (dot DESC, vid) total order
    def q(x: Float): Long = Math.round(x.toDouble * 1048576)
    val codes = vecs.map { case (id, v) => id -> v.map(q) }.toMap
    val expect = (0L until 4L).map { qid =>
      val pq = codes(qid)
      val scored = vecs.filter(_._1 != qid).map { case (vid, _) =>
        val c = codes(vid)
        (vid, (0 until 64).map(i => BigInt(pq(i)) * c(i)).sum,
          (0 until 16).map(i => BigInt(pq(i)) * c(i)).sum)
      }
      val rf = scored.sortBy { case (vid, f, _) => (-f, vid) }
        .zipWithIndex.map { case ((vid, _, _), r) => vid -> (r + 1L) }.toMap
      val rp = scored.sortBy { case (vid, _, p) => (-p, vid) }
        .zipWithIndex.map { case ((vid, _, _), r) => vid -> (r + 1L) }.toMap
      val pre10 = rp.filter(_._2 <= 10).keySet
      val full10 = rf.filter(_._2 <= 10).keySet
      (qid, (pre10 & full10).size.toLong,
        rf.minBy(_._2)._1, rp.minBy(_._2)._1,
        pre10.toSeq.map(v => math.abs(rf(v) - rp(v))).sum)
    }.toList
    assert(got == expect, s"got $got\nwant $expect")
    // fidelity is a real measurement here, not a degenerate identity:
    // at least one probe must see prefix/full disagreement
    assert(expect.exists(_._2 < 10L), "prefix ranking should diverge")
  }
}
