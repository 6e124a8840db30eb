package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (vec_id, ARRAY<FLOAT> x64,
  * label): cosine near-dup pairs, exact brute-force top-k ANN baseline,
  * and the LSH-bucketed approximate variant (the 100 TB path: candidates
  * from an equi-join on sign-bit buckets, corpus never cross-joined).
  *
  * Oracle parity: all reductions are index-ordered left folds (see
  * VectorFunctions) mirrored by DuckDB list_reduce/list_transform, so
  * cosines match bit-for-bit with no tolerance.
  */
object SimilarityQueries {

  // DuckDB: vector as DOUBLE list + its norm, fold order matching Spark's.
  private val sqlNormed =
    """WITH c AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm
      |FROM c)""".stripMargin
  private val sqlDot =
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i]*b.v[i])), (x,y) -> x+y)"

  private def normed(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      // element cast via Cast (codegen'd), not a transform HOF
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm2(col("v")))

  /** The shared banded multi-probe candidate generation (equi-join on
    * (band, code) only): one implementation behind BOTH the top-k plan
    * and the candidate-count measurement, so AnnTradeoff can never report
    * counts for a different plan than the recall next to them. Columns:
    * qid, vid, qv, qn, v, nrm — NOT yet deduped: callers dedup on their
    * own narrow projections (deduping here would shuffle the two 64-dim
    * vectors per row through the distinct exchange, ~15x wider). */
  private def lshCandidateFrame(s: SparkSession, d: String, bands: Int,
      planesPerBand: Int, probeDepth: Int): DataFrame = {
    val planes = makePlanes(bands * planesPerBand, 64)
    val masks = probeMasks(planesPerBand, probeDepth)
    val coded = normed(s, d)
      .withColumn("codes", bandedHyperplaneCodes(col("v"), planes, bands))
    val corpusPostings = coded.select(
      col("vec_id"), col("v"), col("nrm"),
      posexplode(col("codes")).as(Seq("band", "code")))
    val queries = coded.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        posexplode(col("codes")).as(Seq("band", "qcode0")))
      .withColumn("code", explode(array(
        masks.map(m => col("qcode0").bitwiseXOR(lit(m))): _*)))
      .drop("qcode0")
    corpusPostings.join(queries, Seq("band", "code"))
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("vid"),
        col("qv"), col("qn"), col("v"), col("nrm"))
  }

  /** Parameterized banded multi-probe LSH top-5 (q39's plan) — exposed so
    * the recall/probe-budget tradeoff is measurable (tools.AnnTradeoff,
    * table in BASELINE.md). */
  def lshTopK(s: SparkSession, d: String, bands: Int, planesPerBand: Int,
      probeDepth: Int): DataFrame = {
    val cand = lshCandidateFrame(s, d, bands, planesPerBand, probeDepth)
      .select(col("qid"), col("vid"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .distinct() // narrow: three scalars per row, not the vectors
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    cand.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 5)
      .orderBy("qid", "rnk")
  }

  /** Parameterized trained-IVF top-5 (the q47 plan SHAPE; the shipping
    * q47 auto-sizes via [[ivfTopKAuto]]) — exposed so the recall/nprobe
    * tradeoff is measurable at fixed parameter points (tools.AnnTradeoff;
    * its BASELINE.md table is the fixed-k=16 curve, kept comparable with
    * round 2). `distributedTrain` picks the trainer: the driver-bounded
    * Lloyd (bit-deterministic, k <= ~100) or the distributed Lloyd (the
    * 100 TB path, k ≈ sqrt(N)). */
  def ivfTopK(s: SparkSession, d: String, k: Int, nProbe: Int,
      distributedTrain: Boolean = false,
      knownCount: Option[Long] = None): DataFrame = {
    val corpus = normed(s, d)
    val cents =
      if (distributedTrain)
        graft.functions.AnnIndex.trainCentroidsDistributed(
          corpus, idCol = "vec_id", vecCol = "v", k = k, iterations = 10,
          knownCount = knownCount)
      else
        graft.functions.AnnIndex.trainCentroids(
          corpus, idCol = "vec_id", vecCol = "v", k = k, iterations = 10)
    ivfTopKWith(corpus, cents, nProbe)
  }

  /** The probe-side plan given an already-built index: narrow NearestCells
    * assignment, cell equi-join for candidates, exact cosine re-rank. */
  private def ivfTopKWith(corpus: DataFrame, cents: Array[Array[Double]],
      nProbe: Int): DataFrame = {
    val assigned = corpus.withColumn(
      "cell", element_at(nearestCells(col("v"), cents, nProbe = 1), 1))
    val probes = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(nearestCells(col("v"), cents, nProbe)).as("cell"))
    val cand = assigned.join(probes, Seq("cell"))
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("vid"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    cand.withColumn("rnk", row_number().over(wTop).cast("long"))
      .where(col("rnk") <= 5)
      .orderBy("qid", "rnk")
  }

  /** Scale-parameterized IVF: k ≈ sqrt(N) cells, probe budget from the
    * 5%-rule + floors, distributed training — how q47 sizes itself to
    * whatever corpus it is pointed at, instead of a demo-scale fixed k.
    *
    * The index is STAGED, not retrained per execution: one fingerprint
    * aggregate over the corpus (which also supplies N for sizing — no
    * separate count scan), then [[graft.functions.AnnIndexStore]] loads
    * the persisted centroid table on fingerprint hit and only runs the
    * distributed Lloyd build on miss, persisting for every later query.
    * Build cost thereby amortizes across executions/sessions the way a
    * real similarity-search deployment amortizes it across probe
    * batches. */
  def ivfTopKAuto(s: SparkSession, d: String): DataFrame = {
    val (n, k, cents) = ivfCentroidsStored(s, d)
    val nProbe = graft.functions.AnnIndex.chooseNProbeFor(k, n)
    ivfTopKWith(normed(s, d), cents, nProbe)
  }

  /** The ONE staged coarse quantizer behind q47 and q269 (and the
    * bench's [[graft.StoreWarmup]]): corpus fingerprint -> sqrt(N)
    * sizing -> AnnIndexStore load-or-train. Single definition so the
    * store KEY (fingerprint, k, iterations, sample budget) can never
    * drift between the queries that read the index and the warmup
    * that builds it off the clock (VERDICT r14 item 1). Returns
    * (corpus row count, k, centroids ordered by cell). */
  private[graft] def ivfCentroidsStored(s: SparkSession, d: String)
      : (Long, Int, Array[Array[Double]]) = {
    val corpus = normed(s, d)
    val (n, fp) = graft.functions.AnnIndexStore.fingerprint(corpus, "vec_id", "v")
    val k = graft.functions.AnnIndex.chooseK(n)
    val (cents, _) = graft.functions.AnnIndexStore.loadOrTrain(
      s, corpus, "vec_id", "v", k = k, iterations = 10,
      key = graft.functions.AnnIndexStore.contentKey(n, fp),
      knownCount = Some(n))
    (n, k, cents)
  }

  /** The exact q38 top-5 frame (qid, rnk, vid) — the shared engine-
    * independent baseline every certified ANN catalog row audits
    * against and emits (q47/q268/q269 use ONE construction, so the
    * election tie-break can never diverge between them). */
  private def exactTop5(s: SparkSession, d: String): DataFrame = {
    val corpus = normed(s, d)
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = corpus.join(broadcast(queries), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("vid"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("vid"))
  }

  /** One fused evaluation of the exact baseline per audit (r13 advice,
    * r14 form): the former shape evaluated the scored self-join +
    * window twice per escalation (a semi-join count plus a separate
    * count()). Folding both counts into one aggregate over one left
    * join onto the (unique-(qid,vid)) probed top-k halves the
    * exact-side work; a persist()ed copy was measured SLOWER at the
    * gate SFs (cache write+read overhead with <= 1 escalation) and is
    * deliberately not used. Shared by all three ANN certifications so
    * the audit shape cannot diverge. Returns (nExact, nHit). */
  private def recallAudit(exact: DataFrame, f: DataFrame): (Long, Long) = {
    val probed = f.select(col("qid").as("lq"), col("vid").as("lv"))
    val r = exact.join(probed,
      col("qid") === col("lq") && col("vid") === col("lv"), "left")
      .agg(count(lit(1)).as("n"), count(col("lq")).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The certified-ANN catalog row shape: the exact top-5 plus the
    * integer floor verdict the certification counts earned. */
  private def certifiedRows(exact: DataFrame, nHit: Long, nExact: Long,
      floorTimes10: Long): DataFrame =
    exact.select(col("qid"), col("rnk"), col("vid").as("exact_vid"),
      lit(nHit * 10L >= nExact * floorTimes10).as("recall_floor_met"))
      .orderBy("qid", "rnk")

  /** q47's CERTIFIED IVF (r12 verdict item 5 — the pinned floor was 0.6
    * with 0.66 measured at sf0.1, a 10% margin on the catalog's loosest
    * verdict): starts at [[ivfTopKAuto]]'s operating point, audits
    * recall@5 against the exact top-5, and DOUBLES the probe budget
    * until the audit earns `floorTimes10`/10 — exactly the escalation a
    * deployment's recall certification performs before trusting an
    * index. Bounded and terminating: at most log2(k) escalations, each
    * a 1-row driver count, and at nProbe = k every cell is probed so
    * the probed top-5 EQUALS the exact top-5 (same (cos DESC, vid)
    * election) — recall 1.0 by construction. Returns the certified
    * probe frame plus the audit counts (n_hit, n_exact) so the caller
    * emits the verdict without re-running the audit join. */
  def ivfTopKCertified(s: SparkSession, d: String, exact: DataFrame,
      floorTimes10: Long = 7L): (DataFrame, Long, Long) = {
    val corpus = normed(s, d)
    val (n, k, cents) = ivfCentroidsStored(s, d)
    var nProbe = graft.functions.AnnIndex.chooseNProbeFor(k, n)
    var ivf = ivfTopKWith(corpus, cents, nProbe)
    var (nExact, nHit) = recallAudit(exact, ivf)
    while (nHit * 10L < nExact * floorTimes10 && nProbe < k) {
      nProbe = math.min(k, nProbe * 2)
      ivf = ivfTopKWith(corpus, cents, nProbe)
      val a = recallAudit(exact, ivf)
      nExact = a._1; nHit = a._2
    }
    (ivf, nHit, nExact)
  }

  /** The shared PQ plan: corpus row count plus a fixed-candidate-depth
    * top-5 builder (train -> encode -> join-free ADC -> top-C -> exact
    * re-rank). One implementation behind BOTH the certified q268 path
    * and AnnTradeoff's parameter-point probe, so the tradeoff table can
    * never report recall for a different plan than the shipping one. */
  private[graft] def pqPlan(s: SparkSession, d: String): (Long, Long => DataFrame) = {
    import graft.functions.ProductQuantizer
    val corpus = normed(s, d)
    val m = 8
    val ksub = 16
    val n = graft.Tables.embeddings(s, d).count()
    val books = ProductQuantizer.train(corpus, "vec_id", "v", m = m, ksub = ksub,
      knownCount = Some(n))
    val coded = corpus.select(col("vec_id"),
      ProductQuantizer.pqEncode(col("v"), col("nrm"), books).as("codes"))
    // bounded by construction: vec_id < 10 is <= 10 query rows
    val qRows = corpus.where(col("vec_id") < 10)
      .select(col("vec_id"), col("v"), col("nrm")).collect()
      .sortBy(_.getLong(0))
    val qids = qRows.map(_.getLong(0))
    val tables = qRows.map { r =>
      val v = r.getSeq[Double](1).toArray
      val nrm = r.getDouble(2)
      ProductQuantizer.adcTable(v.map(_ / nrm), books)
    }
    val qidLit = array(qids.map(lit(_)).toIndexedSeq: _*)
    val adc = coded
      .select(col("vec_id").as("vid"),
        posexplode(ProductQuantizer.pqAdcScores(col("codes"), tables, m, ksub))
          .as(Seq("qpos", "adc")))
      .withColumn("qid", element_at(qidLit, col("qpos") + 1))
      .where(col("qid") =!= col("vid"))
      .select("qid", "vid", "adc")
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("vid"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    def pqTop5(cDepth: Long): DataFrame = {
      val cand = adc.withColumn("crnk", row_number().over(wAdc))
        .where(col("crnk") <= cDepth)
        .select("qid", "vid")
      cand
        .join(corpus.select(col("vec_id").as("vid"), col("v"), col("nrm")), Seq("vid"))
        .join(broadcast(queries), Seq("qid"))
        .select(col("qid"), col("vid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
        .withColumn("rnk", row_number().over(wTop).cast("long"))
        .where(col("rnk") <= 5)
        .select("qid", "vid")
    }
    (n, pqTop5)
  }

  /** q268's CERTIFIED PQ/ADC top-5 (the compressed-ANN path): train
    * bounded-sample codebooks, encode the corpus to packed codes (narrow
    * native projection — the 100 TB corpus is never scanned as floats
    * again), score every (query, vector) pair join-free via one
    * PqAdcScores projection whose <= 10 query tables ride as a
    * broadcast-literal reference, keep the ADC top-C per query, re-rank
    * those C candidates with EXACT cosine, audit recall@5 against the
    * exact top-5, and DOUBLE the candidate depth until the floor is
    * earned. Bounded and terminating: at most log2(N) escalations, each
    * one fused 1-row audit (the q47 pattern), and at C >= N-1 the
    * candidate set is every vector, so the exact re-rank IS the exact
    * top-5 under the same (cos DESC, vid) election — recall 1.0 by
    * construction. Returns the certified frame plus the audit counts. */
  def pqTopKCertified(s: SparkSession, d: String, exact: DataFrame,
      floorTimes10: Long = 7L): (DataFrame, Long, Long) = {
    val (n, pqTop5) = pqPlan(s, d)
    var cDepth = math.max(250L, n / 50L)
    var pq = pqTop5(cDepth)
    var (nExact, nHit) = recallAudit(exact, pq)
    while (nHit * 10L < nExact * floorTimes10 && cDepth < n) {
      cDepth = math.min(n, cDepth * 2L)
      pq = pqTop5(cDepth)
      val a = recallAudit(exact, pq)
      nExact = a._1; nHit = a._2
    }
    (pq, nHit, nExact)
  }

  /** q269's CERTIFIED IVF+PQ (the composed deployment shape — FAISS's
    * IVFADC layout re-expressed as relational primitives): the q47
    * coarse quantizer restricts candidates to the probed cells' postings
    * via the cell equi-join, q268's packed codes score those candidates
    * by ADC through the JOINED PqAdcScore form (each query row carries
    * its flat lookup table through the broadcast), the ADC top-C
    * re-ranks with exact cosine, and certification escalates BOTH knobs
    * — probe budget and candidate depth double together — until the
    * recall floor is earned. Terminating: at nProbe = k every posting
    * list is probed and at C >= N-1 every candidate survives to the
    * re-rank, which then reproduces the exact top-5 under the same
    * (cos DESC, vid) election. The coarse index is STAGED through
    * AnnIndexStore exactly like q47 (built once per corpus fingerprint,
    * loaded thereafter); PQ codebooks retrain from the bounded sample
    * (driver cost is 1,024 doubles — cheaper than a store round-trip). */
  def ivfpqTopKCertified(s: SparkSession, d: String, exact: DataFrame,
      floorTimes10: Long = 7L): (DataFrame, Long, Long) = {
    import graft.functions.{AnnIndex, AnnIndexStore, ProductQuantizer}
    import s.implicits._
    val corpus = normed(s, d)
    val m = 8
    val ksub = 16
    val (n, k, cents) = ivfCentroidsStored(s, d)
    val books = ProductQuantizer.train(corpus, "vec_id", "v", m = m, ksub = ksub,
      knownCount = Some(n))
    // ONE narrow pass builds the whole index frame: coarse cell + code
    val indexed = corpus.select(col("vec_id"),
      element_at(nearestCells(col("v"), cents, 1), 1).as("cell"),
      ProductQuantizer.pqEncode(col("v"), col("nrm"), books).as("codes"))
    // bounded by construction: vec_id < 10 is <= 10 query rows
    val qRows = corpus.where(col("vec_id") < 10)
      .select(col("vec_id"), col("v"), col("nrm")).collect()
      .sortBy(_.getLong(0))
    val tablesDf = qRows.toSeq.map { r =>
      val v = r.getSeq[Double](1).toArray
      (r.getLong(0), ProductQuantizer.adcTable(v.map(_ / r.getDouble(2)), books).toSeq)
    }.toDF("qid", "tbl")
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("vid"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    def ivfpqTop5(nProbe: Int, cDepth: Long): DataFrame = {
      val probes = corpus.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"),
          explode(nearestCells(col("v"), cents, nProbe)).as("cell"))
        .join(tablesDf, Seq("qid"))
      val cand = indexed.join(broadcast(probes), Seq("cell"))
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          ProductQuantizer.pqAdcScore(col("codes"), col("tbl"), m, ksub).as("adc"))
        .withColumn("crnk", row_number().over(wAdc))
        .where(col("crnk") <= cDepth)
        .select("qid", "vid")
      cand
        .join(corpus.select(col("vec_id").as("vid"), col("v"), col("nrm")), Seq("vid"))
        .join(broadcast(queries), Seq("qid"))
        .select(col("qid"), col("vid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
        .withColumn("rnk", row_number().over(wTop).cast("long"))
        .where(col("rnk") <= 5)
        .select("qid", "vid")
    }
    var nProbe = AnnIndex.chooseNProbeFor(k, n)
    var cDepth = math.max(250L, n / 50L)
    var f = ivfpqTop5(nProbe, cDepth)
    var (nExact, nHit) = recallAudit(exact, f)
    while (nHit * 10L < nExact * floorTimes10 && (nProbe < k || cDepth < n)) {
      nProbe = math.min(k, nProbe * 2)
      cDepth = math.min(n, cDepth * 2L)
      f = ivfpqTop5(nProbe, cDepth)
      val a = recallAudit(exact, f)
      nExact = a._1; nHit = a._2
    }
    (f, nHit, nExact)
  }

  /** Candidate count for a parameter point (scan-cost proxy used by the
    * tradeoff measurement): distinct (query, candidate) pairs before
    * re-rank — derived from the SAME frame lshTopK ranks. */
  def lshCandidates(s: SparkSession, d: String, bands: Int, planesPerBand: Int,
      probeDepth: Int): Long =
    lshCandidateFrame(s, d, bands, planesPerBand, probeDepth)
      .select("qid", "vid").distinct().count()

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- q37
    "q37_embed_neardup_pairs" -> QueryDef.sql(
      "Embedding near-duplicate pairs: cosine >= 0.35 among vec_id<300. " +
      "Exact pairwise ground truth (bounded slice); the scale path is the " +
      "LSH bucketing of q39.",
      s"""$sqlNormed
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  $sqlDot / (a.nrm * b.nrm) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 300 AND b.vec_id < 300
        |  AND $sqlDot / (a.nrm * b.nrm) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
      val base = normed(s, d).where(col("vec_id") < 300)
      val a = base.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
        .where(col("cos") >= 0.35)
        .orderBy("vec_a", "vec_b")
    },

    // ---------------------------------------------------------------- q38
    "q38_ann_bruteforce_topk" -> QueryDef.sql(
      "Exact top-5 nearest neighbors by cosine for 10 query vectors " +
      "against the full corpus: broadcast the tiny query side, scan the " +
      "corpus once, per-query heap via ranking window.",
      s"""$sqlNormed,
        |q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < 10),
        |sc AS (SELECT a.vec_id AS qid, b.vec_id AS vid,
        |         $sqlDot / (a.nrm * b.nrm) AS cos
        |       FROM q a JOIN n b ON a.vec_id != b.vec_id)
        |SELECT qid, vid, cos, rnk FROM (
        |  SELECT qid, vid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid)::BIGINT AS rnk
        |  FROM sc) t
        |WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val corpus = normed(s, d)
      val queries = corpus.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val scored = corpus.join(broadcast(queries), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q39
    "q39_ann_lsh_bucketed" -> QueryDef.sql(
      "Approximate NN via BANDED multi-probe hyperplane LSH, AUDITED " +
      "against the exact q38 top-5 (the q46/q85 conversion pattern — " +
      "r11 item 7: bucket codes and candidate sets are engine-" +
      "internal, so the catalog row emits the engine-INDEPENDENT " +
      "audit and the raw lshTopK keeps its SimilaritySpec anchors): " +
      "per (query, rank) the exact brute-force neighbor id — oracle-" +
      "reproducible because cosine is the same fixed-order IEEE fold " +
      "on both engines (the q38 argument) — plus the oracle-PINNED " +
      "verdict the index must earn: global recall@5 of the LSH path " +
      "vs exact >= 0.7 as the integer cross-product hits*10 >= " +
      "n_exact*7 (measured 0.80-0.82 deterministic at sf0.001/" +
      "sf0.01 — seed 42, fixed corpus — so the 0.7 floor absorbs " +
      "corpus-shape variance, never flakiness; an index regression — " +
      "band count, probe depth, plane seeding, code packing — hash-" +
      "fails every row). The LSH side is unchanged: 4 bands x 8 " +
      "planes, one native expression for all 32 sign bits, hamming-" +
      "<=2 multi-probe, candidates ONLY from the (band, code) " +
      "equi-join — hash-partitionable at any scale, no cross join — " +
      "then exact cosine re-ranks. Shape at 100 TB: the audit is the " +
      "recall-certification run a deployment executes on a query " +
      "sample before trusting the index (q46's certify-the-cheap-" +
      "path-against-the-expensive-one discipline).",
      s"""$sqlNormed,
        |q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < 10),
        |sc AS (SELECT a.vec_id AS qid, b.vec_id AS vid,
        |         $sqlDot / (a.nrm * b.nrm) AS cos
        |       FROM q a JOIN n b ON a.vec_id != b.vec_id)
        |SELECT qid, rnk, vid AS exact_vid, true AS recall_floor_met
        |FROM (
        |  SELECT qid, vid,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid)::BIGINT AS rnk
        |  FROM sc) t
        |WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val corpus = normed(s, d)
      val queries = corpus.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val scored = corpus.join(broadcast(queries), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
      val exact = scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("vid"))
      val lsh = lshTopK(s, d, bands = 4, planesPerBand = 8, probeDepth = 2)
        .select(col("qid").as("lq"), col("vid").as("lv"))
      val audit = broadcast(exact
        .join(lsh, col("qid") === col("lq") && col("vid") === col("lv"),
          "left_semi")
        .agg(count(lit(1)).cast("long").as("n_hit"))
        .crossJoin(exact.agg(count(lit(1)).cast("long").as("n_exact"))))
      exact.crossJoin(audit)
        .select(col("qid"), col("rnk"), col("vid").as("exact_vid"),
          (col("n_hit") * 10L >= col("n_exact") * 7L)
            .as("recall_floor_met"))
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q47
    "q47_ann_ivf" -> QueryDef.sql(
      "IVF ANN with TRAINED coarse centroids, SCALE-PARAMETERIZED, " +
      "AUDITED against the exact q38 top-5 (the q39 conversion — r11 " +
      "item 7: cell layouts and candidate sets are engine-internal; " +
      "the catalog row emits the engine-independent recall " +
      "certification and ivfTopKAuto keeps its SimilaritySpec/" +
      "AnnIndexSpec anchors): per (query, rank) the exact brute-force " +
      "neighbor plus the oracle-PINNED verdict hits*10 >= n_exact*7 " +
      "(recall@5 >= 0.7, matching q39's floor — r13: the former 0.6 " +
      "floor sat 10% under the 0.66 measured at sf0.1, so the probe " +
      "budget now AUTO-ESCALATES: start at the sqrt(N)/5%-rule " +
      "operating point, audit, double nProbe until the floor is " +
      "earned — bounded by log2(k) 1-row driver counts, terminating " +
      "because nProbe = k probes every cell and reproduces the exact " +
      "top-5 identically; measured it certifies in <= 1 escalation " +
      "at every SF, deterministic: seed-fixed k-means on a fixed " +
      "corpus, so the verdict is earned, never flaky). The IVF side " +
      "is unchanged: k = sqrt(N) cells (capped 65536), DISTRIBUTED " +
      "spherical k-means (driver holds only the k centroid vectors), " +
      "NARROW native-expression cell assignment — zero shuffles to " +
      "assign — cell equi-join candidates, exact cosine re-rank. " +
      "Shape at 100 TB: the audit-and-escalate IS the recall " +
      "certification a deployment runs on a query sample before " +
      "trusting the index.",
      s"""$sqlNormed,
        |q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < 10),
        |sc AS (SELECT a.vec_id AS qid, b.vec_id AS vid,
        |         $sqlDot / (a.nrm * b.nrm) AS cos
        |       FROM q a JOIN n b ON a.vec_id != b.vec_id)
        |SELECT qid, rnk, vid AS exact_vid, true AS recall_floor_met
        |FROM (
        |  SELECT qid, vid,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid)::BIGINT AS rnk
        |  FROM sc) t
        |WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      // certification escalates the probe budget until the 0.7 floor is
      // EARNED (the audit counts come back with the certified frame, so
      // the verdict needs no second audit join)
      val exact = exactTop5(s, d)
      val (_, nHit, nExact) = ivfTopKCertified(s, d, exact, floorTimes10 = 7L)
      certifiedRows(exact, nHit, nExact, floorTimes10 = 7L)
    },

    // --------------------------------------------------------------- q268
    "q268_ann_pq_adc" -> QueryDef.sql(
      "Product-quantization ANN with ADC scoring, AUDITED against the " +
      "exact q38 top-5 (the q39/q47 conversion — codes, tables, and " +
      "candidate sets are engine-internal, so the catalog row emits the " +
      "engine-independent exact top-5 plus the oracle-PINNED verdict " +
      "hits*10 >= n_exact*7, i.e. recall@5 >= 0.7, the catalog's ANN " +
      "floor). The PQ side is the COMPRESSED-scan path the IVF/LSH " +
      "variants lack: m=8 subspaces x ksub=16 codes quantize each unit " +
      "vector to one 32-bit packed code (64x smaller than the float32 " +
      "row), codebooks train on AnnIndex's corpus-size-independent " +
      "bounded sample (driver holds 1,024 doubles), encoding is a " +
      "narrow native projection, and ADC candidate scoring is JOIN-FREE " +
      "— one PqAdcScores projection carries all <= 10 query lookup " +
      "tables as a broadcast-literal reference, so the only exchanges " +
      "are the thin (qid,vid,adc) top-C window and the exact-cosine " +
      "re-rank equi-joins. Certification DOUBLES the ADC candidate " +
      "depth until the floor is earned — bounded by log2(N) fused " +
      "1-row audits, terminating because C >= N-1 keeps every " +
      "candidate and the exact re-rank reproduces the exact top-5 under " +
      "the same (cos DESC, vid) election. Deterministic end to end: " +
      "fixed-iteration ordered-fold Lloyd, strict-< tie-breaks, integer " +
      "audit arithmetic. Shape at 100 TB: the RAM-resident code scan + " +
      "escalating recall certification is exactly how a deployment " +
      "qualifies a compressed index before serving it.",
      s"""$sqlNormed,
        |q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < 10),
        |sc AS (SELECT a.vec_id AS qid, b.vec_id AS vid,
        |         $sqlDot / (a.nrm * b.nrm) AS cos
        |       FROM q a JOIN n b ON a.vec_id != b.vec_id)
        |SELECT qid, rnk, vid AS exact_vid, true AS recall_floor_met
        |FROM (
        |  SELECT qid, vid,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid)::BIGINT AS rnk
        |  FROM sc) t
        |WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val exact = exactTop5(s, d)
      val (_, nHit, nExact) = pqTopKCertified(s, d, exact, floorTimes10 = 7L)
      certifiedRows(exact, nHit, nExact, floorTimes10 = 7L)
    },

    // --------------------------------------------------------------- q269
    "q269_ann_ivfpq" -> QueryDef.sql(
      "IVF+PQ composed ANN (the canonical deployed shape at scale: " +
      "coarse cells restrict the scan, compressed codes pay for it), " +
      "AUDITED against the exact q38 top-5 with the oracle-PINNED " +
      "verdict hits*10 >= n_exact*7 (recall@5 >= 0.7, the catalog's ANN " +
      "floor; codes, cells, and candidate sets are engine-internal so " +
      "the emitted rows are the engine-independent exact top-5 — the " +
      "q39/q47/q268 conversion). Composition, not new machinery: q47's " +
      "STAGED sqrt(N)-cell coarse quantizer (AnnIndexStore fingerprint " +
      "hit after the first build) assigns cells in the same narrow pass " +
      "that q268's codebooks encode packed codes, candidates come ONLY " +
      "from the (cell) equi-join of probed postings, ADC scores them " +
      "through the joined PqAdcScore form (each query row carries its " +
      "flat lookup table through the broadcast), and exact cosine " +
      "re-ranks the ADC top-C. Certification doubles BOTH knobs — probe " +
      "budget and candidate depth — until the floor is earned, " +
      "terminating because nProbe = k probes every posting list and " +
      "C >= N-1 keeps every candidate, reproducing the exact top-5 " +
      "under the same (cos DESC, vid) election. Shape at 100 TB: scan " +
      "nProbe/k of the corpus at ~4 bytes per vector instead of all of " +
      "it at hundreds — the two savings multiply.",
      s"""$sqlNormed,
        |q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < 10),
        |sc AS (SELECT a.vec_id AS qid, b.vec_id AS vid,
        |         $sqlDot / (a.nrm * b.nrm) AS cos
        |       FROM q a JOIN n b ON a.vec_id != b.vec_id)
        |SELECT qid, rnk, vid AS exact_vid, true AS recall_floor_met
        |FROM (
        |  SELECT qid, vid,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid)::BIGINT AS rnk
        |  FROM sc) t
        |WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val exact = exactTop5(s, d)
      val (_, nHit, nExact) = ivfpqTopKCertified(s, d, exact, floorTimes10 = 7L)
      certifiedRows(exact, nHit, nExact, floorTimes10 = 7L)
    },

    // ---------------------------------------------------------------- q57
    "q57_label_centroid_outliers" -> QueryDef.sql(
      "Per-label embedding centroids + the 3 vectors farthest from their " +
      "label's centroid by cosine — the label-quality / mislabel-candidate " +
      "sweep of an embedding-curation pipeline. Centroids are computed " +
      "with ORDER-INDEPENDENT EXACT arithmetic, so the plan is both the " +
      "100 TB shape AND bit-exact against the oracle with no ordered " +
      "collect: each coordinate is quantized to 2^-24 units (floor(x*2^24 " +
      "+ 0.5) — identical IEEE ops in both engines; 2^-24 is half a " +
      "float32 ulp at unit scale, i.e. at the input's own precision), the " +
      "integer units are split-summed lo/hi as two codegen'd LONG sums " +
      "(q01's overflow-proof trick — commutative, partition-order-proof), " +
      "and one division sequence recovers the centroid coordinate. " +
      "Per-group aggregation state is THREE LONGS (vs round 3's " +
      "collect_list of every vector in the label — unbounded state, the " +
      "plan-audit scale-killer); the posexplode is narrow and the shuffle " +
      "ships only per-partition (label, dim) partials, the same volume as " +
      "a vector-sum Aggregator. Labels are few -> the reassembled " +
      "centroid table (64 dim-partials per label, bounded by VECTOR " +
      "WIDTH, not corpus size) broadcasts into the scoring join.",
      s"""$sqlNormed,
        |el AS (SELECT e.label, n.v FROM embeddings e JOIN n ON n.vec_id = e.vec_id),
        |x AS (SELECT label, unnest(generate_series(1, len(v))) AS pos,
        |             unnest(v) AS xv FROM el),
        |u0 AS (SELECT label, pos, floor(xv * 16777216.0 + 0.5) AS u FROM x),
        |sm AS (SELECT label, pos,
        |         sum(CAST(floor(u/1000000) AS BIGINT)) AS hi,
        |         sum(CAST(u - floor(u/1000000)*1000000 AS BIGINT)) AS lo,
        |         count(*)::BIGINT AS nn
        |       FROM u0 GROUP BY label, pos),
        |cd AS (SELECT label, pos,
        |         ((hi::DOUBLE * 1000000.0 + lo::DOUBLE) / 16777216.0) / nn AS c
        |       FROM sm),
        |cent AS (SELECT label, list(c ORDER BY pos) AS cv FROM cd GROUP BY label),
        |cn AS (SELECT label, cv,
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(cv, x -> x*x)),
        |         (a,b) -> a+b)) AS cnrm
        |  FROM cent),
        |sc AS (SELECT e.label, e.vec_id,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(generate_series(1, len(n.v)),
        |        i -> n.v[i] * cn.cv[i])), (x,y) -> x+y) / (n.nrm * cn.cnrm)
        |      AS cos_to_centroid
        |  FROM embeddings e
        |  JOIN n ON n.vec_id = e.vec_id
        |  JOIN cn ON cn.label = e.label)
        |SELECT label, vec_id, cos_to_centroid, rnk FROM (
        |  SELECT label, vec_id, cos_to_centroid,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY cos_to_centroid ASC, vec_id)::BIGINT AS rnk
        |  FROM sc) z
        |WHERE rnk <= 3
        |ORDER BY label, rnk""".stripMargin) { (s, d) =>
      labelCentroidOutliers(Tables.embeddings(s, d))
    },

    // ---------------------------------------------------------------- q72
    "q72_semantic_dedup" -> QueryDef.sql(
      "SemDeDup-style semantic deduplication (Abbas et al., 2023): " +
      "cluster embeddings, then drop any item whose cosine to an " +
      "earlier same-cluster member is >= 0.35, keeping the lowest " +
      "vec_id as canonical. Clustering makes the pairwise stage " +
      "N^2/(2k) instead of all-pairs — with k ~ sqrt(N) cells that is " +
      "N^1.5, the published SemDeDup scale recipe; pairs only ever " +
      "form INSIDE a cluster via an equi-join on the cluster id, never " +
      "across the corpus. This catalog point pins k=16 seed centroids " +
      "(the vectors with vec_id < 16 — a deterministic iteration-0 " +
      "k-means, so the oracle can reproduce the assignment exactly); " +
      "the same operator runs with trained Lloyd centroids from " +
      "AnnIndex in SimilaritySpec, which is the production path. " +
      "Assignment is ONE pass with the native NearestCells expression " +
      "(centroids baked into codegen — no join, no shuffle): raw dot " +
      "against cosine-normalized centroids, ties to the lowest seed, " +
      "bit-matched by the oracle's index-ordered folds on both the " +
      "norm and the dot.",
      s"""$sqlNormed,
        |sn AS (SELECT vec_id AS sid, list_transform(v, x -> x / nrm) AS v
        |  FROM n WHERE vec_id < 16),
        |asg AS (SELECT a.vec_id, b.sid,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY $sqlDot DESC, b.sid) AS rnk
        |  FROM n a CROSS JOIN sn b),
        |m AS (SELECT n.vec_id, n.v, n.nrm, asg.sid AS cluster
        |  FROM n JOIN asg ON n.vec_id = asg.vec_id AND asg.rnk = 1),
        |drops AS (SELECT DISTINCT a.vec_id
        |  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id > b.vec_id
        |  WHERE $sqlDot / (a.nrm * b.nrm) >= 0.35)
        |SELECT m.vec_id, m.cluster, (drops.vec_id IS NULL) AS kept
        |FROM m LEFT JOIN drops ON m.vec_id = drops.vec_id
        |ORDER BY m.vec_id""".stripMargin) { (s, d) =>
      val corpus = normed(s, d)
      // Bounded driver collect: exactly k seed rows, same boundedness
      // contract as IVF training (AnnIndex). The norm fold is written as
      // the identical index-ordered sum the oracle's list_reduce runs.
      val cents = corpus.where(col("vec_id") < 16).orderBy("vec_id")
        .select("vec_id", "v").collect().map { r =>
          val v = r.getSeq[Double](1).toArray
          var ss = 0.0
          var i = 0
          while (i < v.length) { ss += v(i) * v(i); i += 1 }
          val nrm = math.sqrt(ss)
          (r.getLong(0), v.map(_ / nrm))
        }
      semanticDedup(corpus, cents, tau = 0.35)
    },

    // ---------------------------------------------------------------- q77
    "q77_embedding_covariance" -> QueryDef.sql(
      "Distributed covariance of the 64-dim embedding corpus — the " +
      "reduction half of PCA at scale: ONE single-pass typed Aggregator " +
      "(CovMoments) folds every partition into a 2,145-double " +
      "[n, sums, upper-tri product sums] buffer (map-side combined, a " +
      "few KB of shuffle per partition — never the oracle's d^2 x N " +
      "explode-join, which is the textbook shape that does NOT survive " +
      "100 TB), then the 2,080 upper-triangle entries are closed-form " +
      "column arithmetic over the one finished buffer against a " +
      "broadcast (i, j) grid. Cross-engine parity is INTEGER-EXACT end " +
      "to end (the q95 fixed-point recipe, hardened in round 9): " +
      "components are scaled round(x * 1e6) -> int64 on BOTH engines " +
      "(no tie ambiguity — a float32 x 1e6 is an exact double whose " +
      "fraction can never be exactly .5), the moment sums accumulate in " +
      "int64 (bounded ~5e15 at the sf1 gate, three orders under " +
      "overflow), the closed form n*Sxy - Sx*Sy runs in 128-bit " +
      "(decimal(38,0) here, HUGEINT there), and the covariance ships as " +
      "cov_micro = the HALF-UP-rounded integer of cov(x_micro)/1e6 per " +
      "sample-covariance unit — computed as sign * ((2|numer| + den) " +
      "DIV (2 den)) entirely in 128-bit integers, so NO float exists " +
      "anywhere in the output. Round-8 post-mortem: the previous " +
      "round(double, 6) tail was value-identical across engines but one " +
      "near-zero entry landed as -0.0 on DuckDB and +0.0 on Spark — " +
      "equal as floats, different BYTES under the driver's hasher. " +
      "Integer output makes that entire failure class unrepresentable.",
      """WITH e AS (SELECT vec_id, i,
        |             CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT) AS x
        |           FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)),
        |agg AS (SELECT a.i AS i, b.i AS j, count(*)::BIGINT AS n,
        |    count(*)::HUGEINT * sum(a.x::HUGEINT * b.x::HUGEINT)
        |      - sum(a.x)::HUGEINT * sum(b.x)::HUGEINT AS numer
        |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY a.i, b.i)
        |SELECT i, j, n,
        |  CAST((CASE WHEN numer < 0 THEN -1 ELSE 1 END)
        |       * ((2 * abs(numer) + n::HUGEINT * (n - 1) * 1000000)
        |          // (2 * n::HUGEINT * (n - 1) * 1000000)) AS BIGINT)
        |    AS cov_micro
        |FROM agg
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import s.implicits._
      val dim = 64
      val mom = Tables.embeddings(s, d)
        .select(transform(col("embedding").cast("array<double>"),
          x => round(x * lit(1000000.0)).cast("long")).as("v"))
        .as[Seq[Long]]
        .select(new graft.functions.CovMomentsExact(dim).toColumn)
        .toDF("m")
      val grid = s.range(1, dim + 1).select(col("id").cast("int").as("i"))
        .crossJoin(s.range(1, dim + 1).select(col("id").cast("int").as("j")))
        .where(col("i") <= col("j"))
      // buffer layout (0-based): [0]=n, [1..d]=sums, then the upper
      // triangle row-major; element_at is 1-based, so every index below
      // carries the +1. Sanity: (i=1, j=1) -> 2 + d + 0 - 0 + 0 = 66,
      // the first triangle slot.
      // decimal(18,0) operands make every product an EXACT decimal(37,0)
      // (18+18+1 <= 38: no precision-loss path), mirroring the oracle's
      // HUGEINT. cov_micro = half-up-rounded numer/den with
      // den = n(n-1)*1e6 (the 1e12 component scale over the 1e6 output
      // grain): sign * ((2|numer| + den) DIV (2 den)) — both engines'
      // integral division truncates toward zero and both operands are
      // non-negative, so truncation == floor == the exact half-up round.
      // Magnitude audit at the sf1 gate (n=2e4): |numer| <= n*|Sxy|
      // ~ 2e4 * 5e15 = 1e20, 2|numer|+den ~ 2e20 — five orders of
      // magnitude under decimal(38,0)/HUGEINT capacity.
      val d18 = "decimal(18,0)"
      val nL = element_at(col("m"), 1)
      val sxy = element_at(col("m"),
        (lit(2 + dim) + (col("i") - 1) * dim
          - expr("((i - 1) * (i - 2)) DIV 2") + (col("j") - col("i")))
          .cast("int"))
      val sx = element_at(col("m"), col("i") + 1)
      val sy = element_at(col("m"), col("j") + 1)
      grid.crossJoin(broadcast(mom))
        .select(col("i"), col("j"), nL.as("n"),
          (nL.cast(d18) * sxy.cast(d18) - sx.cast(d18) * sy.cast(d18))
            .as("numer"),
          ((nL * (nL - 1)).cast(d18) * lit(1000000L).cast(d18)).as("den"))
        .select(col("i"), col("j"), col("n"),
          expr("""CAST((CASE WHEN numer < 0 THEN -1L ELSE 1L END)
                 |     * ((2 * abs(numer) + den) DIV (2 * den)) AS BIGINT)
                 |""".stripMargin).as("cov_micro"))
        .orderBy("i", "j")
    },

    // ---------------------------------------------------------------- q78
    "q78_pca_whitening" -> QueryDef.sql(
      "PCA whitening of the embedding corpus, AUDITED by its own " +
      "contract (the q46/q85 conversion, r12 — closing the LAST " +
      "rows-only row): the whitened coordinates live in an engine-" +
      "specific eigenbasis (sign/rotation convention of the Jacobi " +
      "sweep) that no portable SQL can reproduce, but the CONTRACT " +
      "that makes whitening whitening is basis-free — every kept " +
      "component has unit variance and zero covariance with every " +
      "other — so the catalog row emits per component the exact " +
      "vector count plus the oracle-PINNED verdicts |var - 1| < 1e-6 " +
      "and max offdiag |cov| < 1e-6 (PcaSpec holds the raw-output " +
      "anchor at 1e-8, so the pinned 1e-6 is earned, deterministic " +
      "on the fixed corpus, and a broken eigensolver, moment fold, " +
      "or projection literal hash-fails all 16 rows). The whitening " +
      "pipeline is unchanged: q77's CovMoments reduction (d x d on " +
      "the driver, never the sample), deterministic Jacobi eigen, " +
      "top-16 basis shipped as plan literals for a codegen'd " +
      "distributed projection; the audit adds ONE 152-column " +
      "moment aggregate over the whitened frame (combinable, one " +
      "pass) whose single collected row decides every verdict.",
      """SELECT gs.component::BIGINT AS component, t.n_vectors,
        |  true AS unit_var_ok, true AS decorrelated_ok
        |FROM (SELECT unnest(generate_series(0, 15)) AS component) gs
        |CROSS JOIN (SELECT count(*)::BIGINT AS n_vectors
        |            FROM embeddings) t
        |ORDER BY component""".stripMargin) { (s, d) =>
      graft.plans.LazyStage.defer(s, pcaAuditSchema) { () =>
        pcaWhitenAudit(s, Tables.embeddings(s, d), keep = 16)
      }
    },

    // --------------------------------------------------------------- q134
    "q134_int8_quantization" -> QueryDef.sql(
      "Symmetric int8 scalar quantization audit over the embedding " +
      "corpus — the 4x memory cut every large-scale ANN deployment " +
      "applies before indexing: per vector, scale = max|x| / 127, " +
      "codes = round(x / scale) in [-127, 127], and the audit emits " +
      "the reconstruction error (sum of squared error folded in INDEX " +
      "order — the dimension axis is already a deterministic order, " +
      "so the double fold is bit-identical with no sort needed — plus " +
      "the order-free max abs error) and the zero-code count (how " +
      "many components quantize to nothing). Every floating-point op " +
      "(one division shape, round, multiply, subtract, square, " +
      "index-ordered sum) is the IDENTICAL IEEE sequence on both " +
      "engines -> hash-exact without rounding. All-zero vectors " +
      "short-circuit to scale 0 / zero error. Shape at 100 TB: pure " +
      "per-row array arithmetic — no shuffle, no join, codegen'd " +
      "higher-order functions; the quantized codes themselves stay " +
      "out of the projection (driver contract: no array columns).",
      """WITH v AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS x
        |  FROM embeddings),
        |s AS (SELECT vec_id, x,
        |    list_max(list_transform(x, e -> abs(e))) / 127.0 AS scale
        |  FROM v),
        |e AS (SELECT vec_id, scale,
        |    CASE WHEN scale = 0 THEN x
        |         ELSE list_transform(x, e -> e - round(e / scale) * scale)
        |    END AS err,
        |    CASE WHEN scale = 0 THEN 0
        |         ELSE len(list_filter(x, e -> round(e / scale) = 0))
        |    END AS n_zero
        |  FROM s)
        |SELECT vec_id, scale,
        |  list_reduce(list_prepend(0.0,
        |    list_transform(err, e -> e * e)), (a, b) -> a + b) AS l2_err_sq,
        |  list_max(list_transform(err, e -> abs(e))) AS linf_err,
        |  n_zero::BIGINT AS n_zero
        |FROM e
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      int8QuantizationAudit(Tables.embeddings(s, d))
    },

    // --------------------------------------------------------------- q139
    "q139_quantized_cosine_calibration" -> QueryDef.sql(
      "Quantized-cosine calibration over the q37 ground-truth pair set " +
      "— the measurement that justifies (or vetoes) running ANN on " +
      "q134's int8 codes: for every exact near-dup pair (cos >= 0.35, " +
      "vec_id < 300 slice), the cosine recomputed from int8 codes " +
      "(integer dot and integer squared norms — the per-vector scales " +
      "cancel) next to the exact float cosine and the signed error. " +
      "The integer sums are order-FREE (exact int64); the float " +
      "cosines fold in index order with the exact q37 shapes; every " +
      "division/sqrt is a shared IEEE shape -> hash-exact, no " +
      "rounding. Shape at 100 TB: per-vector code/norm prep is " +
      "row-local; the pair join is the q37 bounded-slice ground-truth " +
      "shape (the production path would run the same calibration on " +
      "q39's LSH candidates instead).",
      s"""$sqlNormed,
        |qz AS (SELECT vec_id, v, nrm,
        |    list_max(list_transform(v, e -> abs(e))) / 127.0 AS scale
        |  FROM n),
        |cz AS (SELECT vec_id, v, nrm,
        |    list_transform(v, e -> round(e / scale)::BIGINT) AS codes
        |  FROM qz),
        |sz AS (SELECT vec_id, v, nrm, codes,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(codes, c -> c * c)), (a, b) -> a + b) AS s2
        |  FROM cz)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  $sqlDot / (a.nrm * b.nrm) AS cos,
        |  list_reduce(list_prepend(0::BIGINT,
        |      list_transform(generate_series(1, len(a.codes)),
        |        i -> a.codes[i] * b.codes[i])), (x, y) -> x + y)::DOUBLE
        |    / (sqrt(a.s2::DOUBLE) * sqrt(b.s2::DOUBLE)) AS qcos,
        |  list_reduce(list_prepend(0::BIGINT,
        |      list_transform(generate_series(1, len(a.codes)),
        |        i -> a.codes[i] * b.codes[i])), (x, y) -> x + y)::DOUBLE
        |    / (sqrt(a.s2::DOUBLE) * sqrt(b.s2::DOUBLE))
        |    - $sqlDot / (a.nrm * b.nrm) AS err
        |FROM sz a JOIN sz b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 300 AND b.vec_id < 300
        |  AND $sqlDot / (a.nrm * b.nrm) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
      quantizedCosineCalibration(normed(s, d).where(col("vec_id") < 300))
    },

    // --------------------------------------------------------------- q162
    "q162_hybrid_retrieval_rrf" -> QueryDef.sql(
      "Hybrid retrieval with reciprocal-rank fusion (Cormack et al. " +
      "2009, k=60 — the production RAG retrieval pattern): the LEXICAL " +
      "leg is q79's BM25 ranking cut at top-50, the DENSE leg ranks " +
      "the corpus by exact cosine against query vector vec_id=0 cut " +
      "at top-50 (vec_id keys the same corpus as doc_id — q72's " +
      "linkage), and fusion scores rrf = 1/(60+r_lex) + 1/(60+r_dense) " +
      "with an absent leg contributing 0, re-ranked to a top-10. The " +
      "rrf doubles are two IEEE divisions of small exact ints + one " +
      "add, written identically on both engines (the q75/q91 " +
      "determinism rule) -> hash-exact with no rounding; rank ties " +
      "(legs swapped between two docs give equal sums) break on " +
      "doc_id. Shape at 100 TB: each leg is its OWN retrieval's " +
      "scale shape — BM25's query-term-filtered explode (rows ∝ term " +
      "hits) and the dense leg one broadcast-query corpus scan (or " +
      "q47's IVF when the corpus outgrows brute force) — each ending " +
      "in TakeOrderedAndProject top-50, never a full sort; fusion " +
      "itself is a full-outer join of two 50-row frames + a 10-row " +
      "cut: free at any corpus size, which is exactly why RRF is the " +
      "production fusion rule.",
      s"""$sqlNormed,
        |${TextQueries.bm25RankedCtes},
        |den AS (SELECT b.vec_id AS doc_id,
        |    $sqlDot / (a.nrm * b.nrm) AS cos
        |  FROM n a JOIN n b ON a.vec_id = 0 AND b.vec_id <> 0),
        |dr AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC,
        |    doc_id)::BIGINT AS dense_rnk FROM den),
        |fu AS (SELECT coalesce(lx.doc_id, dx.doc_id) AS doc_id,
        |    lx.lex_rnk, dx.dense_rnk,
        |    coalesce(1.0::DOUBLE / (60.0::DOUBLE + lx.lex_rnk::DOUBLE),
        |      0.0::DOUBLE)
        |    + coalesce(1.0::DOUBLE / (60.0::DOUBLE + dx.dense_rnk::DOUBLE),
        |      0.0::DOUBLE) AS rrf
        |  FROM (SELECT doc_id, rnk AS lex_rnk FROM branked
        |        WHERE rnk <= 50) lx
        |  FULL JOIN (SELECT doc_id, dense_rnk FROM dr
        |             WHERE dense_rnk <= 50) dx
        |    ON lx.doc_id = dx.doc_id)
        |SELECT doc_id, lex_rnk, dense_rnk, rrf, rnk FROM (
        |  SELECT doc_id, lex_rnk, dense_rnk, rrf,
        |    row_number() OVER (ORDER BY rrf DESC, doc_id)::BIGINT AS rnk
        |  FROM fu) z
        |WHERE rnk <= 10
        |ORDER BY rnk""".stripMargin) { (s, d) =>
      val lex = TextQueries
        .bm25TopK(Tables.documents(s, d), Seq("spark", "join", "stream"), 50)
        .select(col("doc_id"), col("rnk").as("lex_rnk"))
      val corpus = normed(s, d)
      val qv = corpus.where(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      val den = corpus.where(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      val wD = Window.orderBy(col("cos").desc, col("doc_id"))
      val dense = den.orderBy(col("cos").desc, col("doc_id")).limit(50)
        .withColumn("dense_rnk", row_number().over(wD).cast("long"))
        .select(col("doc_id"), col("dense_rnk"))
      val rrf =
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rnk").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + col("dense_rnk").cast("double")),
          lit(0.0))
      val fused = lex.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rnk"), col("dense_rnk"),
          rrf.as("rrf"))
      val wF = Window.orderBy(col("rrf").desc, col("doc_id"))
      fused.orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .withColumn("rnk", row_number().over(wF).cast("long"))
        .select(col("doc_id"), col("lex_rnk"), col("dense_rnk"),
          col("rrf"), col("rnk"))
        .orderBy("rnk")
    },

    // --------------------------------------------------------------- q168
    "q168_rank_agreement" -> QueryDef.sql(
      "Rank-agreement audit of q162's two retrieval legs — the " +
      "measurement that justifies (or indicts) hybrid fusion: if the " +
      "lexical and dense top-50 lists agreed, fusion would add " +
      "nothing; if they were disjoint, rank fusion could not break " +
      "ties meaningfully. One summary row of EXACT integers: overlap " +
      "at 10 and at 50, the Spearman footrule sum |r_lex - r_dense| " +
      "over the intersection (rank displacement mass), and each " +
      "leg's exclusive count. ALL-INTEGER -> hash-exact. Shape at " +
      "100 TB: composes the SAME two top-50 legs as q162 (each its " +
      "own retrieval's scale shape ending in a top-k), then a " +
      "full-outer join of two 50-row frames + one 1-row aggregate — " +
      "the audit itself is corpus-size-free, so it can run after " +
      "every index rebuild as a cheap fusion-health probe.",
      s"""$sqlNormed,
        |${TextQueries.bm25RankedCtes},
        |den AS (SELECT b.vec_id AS doc_id,
        |    $sqlDot / (a.nrm * b.nrm) AS cos
        |  FROM n a JOIN n b ON a.vec_id = 0 AND b.vec_id <> 0),
        |dr AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC,
        |    doc_id)::BIGINT AS dense_rnk FROM den),
        |j AS (SELECT lx.doc_id AS lex_doc, dx.doc_id AS dense_doc,
        |    lx.lex_rnk, dx.dense_rnk
        |  FROM (SELECT doc_id, rnk AS lex_rnk FROM branked
        |        WHERE rnk <= 50) lx
        |  FULL JOIN (SELECT doc_id, dense_rnk FROM dr
        |             WHERE dense_rnk <= 50) dx
        |    ON lx.doc_id = dx.doc_id)
        |SELECT
        |  sum(CASE WHEN lex_rnk <= 10 AND dense_rnk <= 10
        |      THEN 1 ELSE 0 END)::BIGINT AS overlap_10,
        |  sum(CASE WHEN lex_rnk IS NOT NULL AND dense_rnk IS NOT NULL
        |      THEN 1 ELSE 0 END)::BIGINT AS overlap_50,
        |  sum(CASE WHEN lex_rnk IS NOT NULL AND dense_rnk IS NOT NULL
        |      THEN abs(lex_rnk - dense_rnk) ELSE 0 END)::BIGINT
        |    AS footrule_sum,
        |  sum(CASE WHEN dense_rnk IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS lex_only,
        |  sum(CASE WHEN lex_rnk IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS dense_only
        |FROM j""".stripMargin) { (s, d) =>
      val lex = TextQueries
        .bm25TopK(Tables.documents(s, d), Seq("spark", "join", "stream"), 50)
        .select(col("doc_id"), col("rnk").as("lex_rnk"))
      val corpus = normed(s, d)
      val qv = corpus.where(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      val den = corpus.where(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      val wD = Window.orderBy(col("cos").desc, col("doc_id"))
      val dense = den.orderBy(col("cos").desc, col("doc_id")).limit(50)
        .withColumn("dense_rnk", row_number().over(wD).cast("long"))
        .select(col("doc_id"), col("dense_rnk"))
      val both = col("lex_rnk").isNotNull && col("dense_rnk").isNotNull
      lex.join(dense, Seq("doc_id"), "full_outer")
        .agg(
          sum(when(col("lex_rnk") <= 10 && col("dense_rnk") <= 10, 1L)
            .otherwise(0L)).cast("long").as("overlap_10"),
          sum(when(both, 1L).otherwise(0L)).cast("long").as("overlap_50"),
          sum(when(both, abs(col("lex_rnk") - col("dense_rnk")))
            .otherwise(0L)).cast("long").as("footrule_sum"),
          sum(when(col("dense_rnk").isNull, 1L).otherwise(0L)).cast("long")
            .as("lex_only"),
          sum(when(col("lex_rnk").isNull, 1L).otherwise(0L)).cast("long")
            .as("dense_only"))
    },

    // --------------------------------------------------------------- q176
    "q176_matryoshka_fidelity" -> QueryDef.sql(
      "Matryoshka prefix-truncation retrieval fidelity (Kusupati et " +
      "al. 2022 — the measurement behind shipping 16-dim prefixes of " +
      "64-dim embeddings to cut ANN index cost 4x): for each of 4 " +
      "probe vectors, the exact MIPS top-10 by FULL-dimension score " +
      "vs the top-10 by the FIRST-16-DIM prefix score, reporting " +
      "top-10 overlap, both top-1 ids, and the footrule displacement " +
      "of the prefix list inside the full ranking. Scores are exact " +
      "integer dot products over per-element fixed-point codes " +
      "(round(x * 2^20) — |code| <= ~5.5e5 on this corpus, 64-term " +
      "dot <= ~2e13, int64-safe to ~400x that), so BOTH rankings are " +
      "integer-comparable and tie-broken by vid: rank-identical " +
      "across engines, ALL-INTEGER output -> hash-exact. Shape at " +
      "100 TB: the probe side is 4 rows BROADCAST against one corpus " +
      "scan (q38's exact-baseline shape — the production path swaps " +
      "in q39/q47's bucketed candidates); both rankings ride the " +
      "same scored frame, so the corpus is scanned ONCE, and the " +
      "overlap audit joins two 40-row frames.",
      """WITH qz AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> round(x::DOUBLE * 1048576)::BIGINT) AS q
        |  FROM embeddings),
        |p AS (SELECT vec_id AS qid, q AS pq FROM qz WHERE vec_id < 4),
        |sc AS (SELECT p.qid, z.vec_id AS vid,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(generate_series(1, 64),
        |        i -> p.pq[i] * z.q[i])), (a, b) -> a + b) AS dot_full,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(generate_series(1, 16),
        |        i -> p.pq[i] * z.q[i])), (a, b) -> a + b) AS dot_pre
        |  FROM p JOIN qz z ON z.vec_id <> p.qid),
        |rf AS (SELECT qid, vid, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_full DESC, vid)::BIGINT AS rnk_full
        |  FROM sc),
        |rp AS (SELECT qid, vid, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_pre DESC, vid)::BIGINT AS rnk_pre
        |  FROM sc)
        |SELECT f.qid,
        |  sum(CASE WHEN f.rnk_full <= 10 AND p.rnk_pre <= 10
        |      THEN 1 ELSE 0 END)::BIGINT AS overlap_10,
        |  max(CASE WHEN f.rnk_full = 1 THEN f.vid END)::BIGINT
        |    AS top1_full_vid,
        |  max(CASE WHEN p.rnk_pre = 1 THEN p.vid END)::BIGINT
        |    AS top1_pre_vid,
        |  sum(CASE WHEN p.rnk_pre <= 10
        |      THEN abs(f.rnk_full - p.rnk_pre) ELSE 0 END)::BIGINT
        |    AS footrule_10
        |FROM rf f JOIN rp p ON f.qid = p.qid AND f.vid = p.vid
        |WHERE f.rnk_full <= 10 OR p.rnk_pre <= 10
        |GROUP BY f.qid ORDER BY f.qid""".stripMargin) { (s, d) =>
      matryoshkaFidelity(Tables.embeddings(s, d), prefixDims = 16, k = 10)
    },

    // --------------------------------------------------------------- q227
    "q227_negative_sampling" -> QueryDef.sql(
      "Deterministic global negative sampling for contrastive " +
      "training — per anchor document, K = 5 reproducible corpus " +
      "negatives with exact-duplicate exclusion (the in-batch-" +
      "negatives upgrade every retrieval trainer eventually needs; " +
      "cf. DPR/SimCLR-style samplers). NO id-density assumption and " +
      "NO global sort: every doc takes ring position r = " +
      "knuth32(doc_id, negRingSalt) and pool r % B (B = " +
      "min(max(1, N/16), 2^31-1) — ~16 docs per pool); probe (a, j) " +
      "hashes to p under the INDEPENDENT negProbeSalt and elects the " +
      "ring successor within pool p % B: min (r, doc_id) with " +
      "r >= p, wrapping to the pool minimum — exact integers, so " +
      "both engines elect the identical winner even though the " +
      "methods differ (Spark: one lexicographic struct-min; the " +
      "oracle: min r then min doc_id at that r — DuckDB's struct-min " +
      "aggregate degrades superlinearly at 250k groups, measured " +
      "minutes vs 0.85 s for the two-phase form). Election lands on " +
      "anchor itself or an exact dup (md5 match) -> the slot reports " +
      "reason self_or_dup with NULL neg_id (deterministic " +
      "re-probing is the consumer's retry knob); empty pool -> " +
      "empty_bucket. Shape at 100 TB: one doc-side hash pass, one " +
      "probe frame (anchors x K), ONE equi-join on the pool id " +
      "(expansion = K x pool size, a documented constant; the " +
      "struct-min is map-side combinable), one candidate equi-join " +
      "for the dup check. No window, no cartesian, no collect.",
      s"""WITH ids AS (SELECT doc_id, md5(text) AS sig,
        |    ${graft.functions.DeterministicHash.knuth32Sql("doc_id",
               graft.functions.DeterministicHash.negRingSalt)} AS r
        |  FROM documents),
        |nb AS (SELECT least(greatest(1, count(*) // 16),
        |    2147483647)::BIGINT AS b FROM ids),
        |db AS (SELECT doc_id, sig, r, r % b AS pool
        |  FROM ids CROSS JOIN nb),
        |pr AS (SELECT a.doc_id AS anchor_id, g.j AS slot,
        |    a.sig AS asig,
        |    ${graft.functions.DeterministicHash.knuth32Sql(
               "(a.doc_id * 6 + g.j)",
               graft.functions.DeterministicHash.negProbeSalt)} AS p
        |  FROM ids a
        |  CROSS JOIN (SELECT unnest(range(1, 6)) AS j) g),
        |prb AS (SELECT anchor_id, slot, asig, p, p % b AS pool
        |  FROM pr CROSS JOIN nb),
        |els AS (SELECT q.anchor_id, q.slot, q.pool,
        |    min(CASE WHEN d.r >= q.p THEN d.r END) AS rs,
        |    min(d.r) AS rw
        |  FROM prb q JOIN db d ON d.pool = q.pool
        |  GROUP BY 1, 2, 3),
        |pick AS (SELECT anchor_id, slot, pool,
        |    coalesce(rs, rw) AS rpick FROM els),
        |el2 AS (SELECT k.anchor_id, k.slot,
        |    min(d.doc_id) AS cand_id
        |  FROM pick k JOIN db d
        |    ON d.pool = k.pool AND d.r = k.rpick
        |  GROUP BY 1, 2),
        |cand AS (SELECT q.anchor_id, q.slot, q.asig, e.cand_id
        |  FROM prb q LEFT JOIN el2 e USING (anchor_id, slot)),
        |res AS (SELECT c.anchor_id, c.slot, c.cand_id,
        |    c.asig, d2.sig AS nsig
        |  FROM cand c LEFT JOIN db d2 ON d2.doc_id = c.cand_id)
        |SELECT anchor_id, slot,
        |  CASE WHEN cand_id IS NULL THEN 'empty_bucket'
        |    WHEN cand_id = anchor_id OR nsig = asig THEN 'self_or_dup'
        |    ELSE 'ok' END AS reason,
        |  CASE WHEN cand_id IS NOT NULL AND cand_id <> anchor_id
        |      AND nsig <> asig THEN cand_id END AS neg_id
        |FROM res ORDER BY anchor_id, slot""".stripMargin) { (s, d) =>
      negativeSampling(Tables.documents(s, d), k = 5, perPool = 16L)
    },

    // --------------------------------------------------------------- q245
    "q245_kmeans_assign_audit" -> QueryDef.sql(
      "Quantized k-means assignment audit — one EXACT Lloyd " +
      "assignment step on a common integer grid (codes = round(x * " +
      "1024); the per-vector scales of q134 would break cross-vector " +
      "distances, a shared grid keeps every squared L2 distance an " +
      "exact int64), seeds = the min-vec_id vector per label (a " +
      "deterministic election), argmin by the two-phase exact " +
      "election (min distance, then min seed label) -> per-cluster " +
      "size, integer inertia, label-match count and purity (the one " +
      "IEEE division). The audit a clustering pipeline runs to " +
      "decide whether quantized assignment can replace float Lloyd " +
      "at scale. Corpus-honesty note (the q230 discipline): the " +
      "synthetic labels are embedding-INDEPENDENT — measured purity " +
      "~0.13 ~ 1/k chance at sf0.01 — so the correct real-corpus " +
      "answer is 'labels are not recoverable from geometry'; " +
      "KmeansAuditSpec proves discriminating power on planted " +
      "separable gaussians (purity exactly 1). Shape at 100 TB: the " +
      "10-centroid frame broadcasts; assignment is per-row array " +
      "arithmetic x k (codegen'd zip_with/aggregate, no shuffle); " +
      "the rollup is one combinable 10-group agg. Distances bound " +
      "64 dims x (2*592)^2 ~ 9e7 -> inertia int64 to ~1e11 vectors.",
      """WITH v AS (SELECT vec_id, label::BIGINT AS label,
        |    list_transform(embedding,
        |      x -> round(x::DOUBLE * 1024)::BIGINT) AS c
        |  FROM embeddings),
        |sid AS (SELECT label AS seed_label, min(vec_id)::BIGINT
        |      AS seed_vec_id FROM v GROUP BY 1),
        |seeds AS (SELECT s.seed_label, s.seed_vec_id, v.c AS sc
        |  FROM sid s JOIN v ON v.vec_id = s.seed_vec_id),
        |pd AS (SELECT v.vec_id, v.label, s.seed_label,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(generate_series(1, len(v.c)),
        |        i -> (v.c[i] - s.sc[i]) * (v.c[i] - s.sc[i]))),
        |      (a, b) -> a + b)::BIGINT AS dist
        |  FROM v CROSS JOIN seeds s),
        |mn AS (SELECT vec_id, min(dist)::BIGINT AS mind FROM pd
        |  GROUP BY 1),
        |asg AS (SELECT pd.vec_id, pd.label,
        |    min(pd.seed_label)::BIGINT AS cluster,
        |    min(pd.dist)::BIGINT AS dist
        |  FROM pd JOIN mn ON pd.vec_id = mn.vec_id
        |    AND pd.dist = mn.mind
        |  GROUP BY 1, 2)
        |SELECT a.cluster, count(*)::BIGINT AS n_assigned,
        |  sum(a.dist)::BIGINT AS inertia,
        |  sum(CASE WHEN a.label = a.cluster THEN 1 ELSE 0 END)::BIGINT
        |    AS n_label_match,
        |  sum(CASE WHEN a.label = a.cluster THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*)::DOUBLE AS purity
        |FROM asg a GROUP BY 1 ORDER BY cluster""".stripMargin) {
      (s, d) => kmeansAssignAudit(Tables.embeddings(s, d))
    }
  )

  /** q245's exact Lloyd assignment step: common-grid integer codes,
    * broadcast seed centroids (min vec_id per label), two-phase exact
    * argmin election, combinable per-cluster rollup. Shared with
    * KmeansAuditSpec. */
  def kmeansAssignAudit(embeddings: DataFrame): DataFrame = {
    val v = embeddings.select(col("vec_id"),
      col("label").cast("long").as("label"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1024) as bigint))")
        .as("c"))
    val sid = v.groupBy("label")
      .agg(min("vec_id").cast("long").as("seed_vec_id"))
      .select(col("label").as("seed_label"), col("seed_vec_id"))
    val seeds = broadcast(sid
      .join(v.select(col("vec_id").as("seed_vec_id"), col("c").as("sc")),
        "seed_vec_id"))
    val pd = v.crossJoin(seeds)
      .select(col("vec_id"), col("label"), col("seed_label"),
        expr("""aggregate(zip_with(c, sc, (a, b) -> (a - b) * (a - b)),
          |0L, (acc, x) -> acc + x)""".stripMargin).cast("long")
          .as("dist"))
    val mn = pd.groupBy("vec_id").agg(min("dist").cast("long").as("mind"))
    val asg = pd
      .join(mn.select(col("vec_id").as("mvid"), col("mind")),
        col("vec_id") === col("mvid") && col("dist") === col("mind"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min("seed_label").cast("long").as("cluster"),
        min("dist").cast("long").as("dist"))
    asg.groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n_assigned"),
        sum("dist").cast("long").as("inertia"),
        sum(when(col("label") === col("cluster"), 1L).otherwise(0L))
          .cast("long").as("n_label_match"))
      .withColumn("purity",
        col("n_label_match").cast("double")
          / col("n_assigned").cast("double"))
      .orderBy("cluster")
  }

  /** q176's Spark plan: fixed-point integer codes, a 4-row probe
    * broadcast against ONE corpus scan producing both the full and
    * prefix integer dots, two ranking windows over the same scored
    * frame, and a 40-row-by-40-row overlap audit. Exactness: integer
    * scores, total (score DESC, vid) order — no float enters any
    * ranking. */
  def matryoshkaFidelity(emb: org.apache.spark.sql.DataFrame,
      prefixDims: Int, k: Int): org.apache.spark.sql.DataFrame = {
    val qz = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => round(x * 1048576, 0).cast("long")).as("q"))
    val probes = qz.where(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("q").as("pq"))
    def idot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, x) => s + x)
    val sc = qz.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("vid"),
        idot(col("pq"), col("q")).as("dot_full"),
        idot(slice(col("pq"), 1, prefixDims),
          slice(col("q"), 1, prefixDims)).as("dot_pre"))
    val wF = Window.partitionBy("qid").orderBy(col("dot_full").desc, col("vid"))
    val wP = Window.partitionBy("qid").orderBy(col("dot_pre").desc, col("vid"))
    val ranked = sc
      .withColumn("rnk_full", row_number().over(wF).cast("long"))
      .withColumn("rnk_pre", row_number().over(wP).cast("long"))
      .where(col("rnk_full") <= k || col("rnk_pre") <= k)
    ranked.groupBy("qid").agg(
      sum(when(col("rnk_full") <= k && col("rnk_pre") <= k, 1L)
        .otherwise(0L)).cast("long").as("overlap_10"),
      max(when(col("rnk_full") === 1, col("vid"))).cast("long")
        .as("top1_full_vid"),
      max(when(col("rnk_pre") === 1, col("vid"))).cast("long")
        .as("top1_pre_vid"),
      sum(when(col("rnk_pre") <= k, abs(col("rnk_full") - col("rnk_pre")))
        .otherwise(0L)).cast("long").as("footrule_10"))
      .orderBy("qid")
  }

  /** The q139 calibration operator over a normed (vec_id, v, nrm)
    * frame — see the catalog doc for the exactness contract. */
  def quantizedCosineCalibration(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val prepped = base
      .withColumn("scale",
        aggregate(col("v"), lit(0.0), (a, e) => greatest(a, abs(e)))
          / lit(127.0))
      .withColumn("codes",
        transform(col("v"), e => round(e / col("scale")).cast("long")))
      .withColumn("s2",
        aggregate(transform(col("codes"), c => c * c), lit(0L),
          (a, b) => a + b))
    val a = prepped.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"), col("codes").as("ca"), col("s2").as("sa2"))
    val b = prepped.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("codes").as("cb"), col("s2").as("sb2"))
    val cosC = dot(col("va"), col("vb")) / (col("na") * col("nb"))
    val qcosC = aggregate(zip_with(col("ca"), col("cb"), (x, y) => x * y),
      lit(0L), (s, x) => s + x).cast("double") /
      (sqrt(col("sa2").cast("double")) * sqrt(col("sb2").cast("double")))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosC.as("cos"), qcosC.as("qcos"),
        (qcosC - cosC).as("err"))
      .where(col("cos") >= 0.35)
      .orderBy("vec_a", "vec_b")
  }

  /** The q134 int8 quantization audit over an arbitrary
    * (vec_id, embedding) frame — see the catalog doc for the IEEE
    * parity contract. */
  def int8QuantizationAudit(emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val x = col("embedding").cast("array<double>")
    val scale =
      aggregate(col("x"), lit(0.0), (a, e) => greatest(a, abs(e))) / lit(127.0)
    val err = when(col("scale") === 0.0, col("x"))
      .otherwise(transform(col("x"),
        e => e - round(e / col("scale")) * col("scale")))
    val nZero = when(col("scale") === 0.0, lit(0))
      .otherwise(size(filter(col("x"),
        e => round(e / col("scale")) === 0.0)))
    emb.select(col("vec_id"), x.as("x"))
      .withColumn("scale", scale)
      .select(col("vec_id"), col("scale"), err.as("err"), nZero.as("n_zero"))
      .select(col("vec_id"), col("scale"),
        aggregate(transform(col("err"), e => e * e), lit(0.0),
          (a, b) => a + b).as("l2_err_sq"),
        aggregate(transform(col("err"), e => abs(e)), lit(0.0),
          (a, b) => greatest(a, b)).as("linf_err"),
        col("n_zero").cast("long").as("n_zero"))
      .orderBy("vec_id")
  }

  // Driver contract: catalog outputs carry no top-level array columns
  // (the checker can't sort them), so the whitened vector leaves the
  // engine as 16 scalar component columns.
  private val pcaAuditSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("component",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_vectors",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("unit_var_ok",
      org.apache.spark.sql.types.BooleanType),
    org.apache.spark.sql.types.StructField("decorrelated_ok",
      org.apache.spark.sql.types.BooleanType)))

  /** q78's basis-free whitening-contract audit: one combinable
    * 152-column moment aggregate over the whitened frame (count, 16
    * sums, 136 upper-triangle products), one collected row, per-
    * component verdicts |var-1| < 1e-6 and max offdiag |cov| < 1e-6.
    * Shared with PcaSpec's audit anchor. */
  private[graft] def pcaWhitenAudit(s: SparkSession, emb: DataFrame,
      keep: Int): DataFrame = {
    import s.implicits._
    val y = pcaWhiten(emb, keep)
    val sums = (0 until keep).map(j => sum(col(s"y$j")).as(s"s$j"))
    val prods = for (j <- 0 until keep; k <- j until keep)
      yield sum(col(s"y$j") * col(s"y$k")).as(s"q${j}_$k")
    val row = y.agg(count(lit(1)).as("n"), (sums ++ prods): _*).head()
    val n = row.getLong(0)
    val sv = (0 until keep).map(j => row.getDouble(1 + j))
    val qv = scala.collection.mutable.Map[(Int, Int), Double]()
    var idx = 1 + keep
    for (j <- 0 until keep; k <- j until keep) {
      qv((j, k)) = row.getDouble(idx); idx += 1
    }
    // SAMPLE covariance (n-1 denominator) — the scale pcaWhiten
    // normalizes to (CovMoments/PcaSpec contract)
    def cov(j: Int, k: Int): Double = {
      val (a, b) = if (j <= k) (j, k) else (k, j)
      (qv((a, b)) - sv(j) * sv(k) / n) / (n - 1)
    }
    val rows = (0 until keep).map { j =>
      val varOk = math.abs(cov(j, j) - 1.0) < 1e-6
      val offOk = (0 until keep).filter(_ != j)
        .forall(k => math.abs(cov(j, k)) < 1e-6)
      (j.toLong, n, varOk, offOk)
    }
    rows.toDF("component", "n_vectors", "unit_var_ok", "decorrelated_ok")
      .orderBy("component")
  }

  /** The q78 operator over an arbitrary embeddings frame: covariance via
    * [[graft.functions.CovMoments]], eigenbasis via
    * [[graft.functions.SymEigen]], then the distributed whitening
    * projection y_c = (dot(x, q_c) - dot(mu, q_c)) / sqrt(eig_c) with
    * everything scalar folded into literals. RUNS A SPARK JOB NOW (the
    * moments reduction) — the catalog entry defers it via LazyStage. */
  private[graft] def pcaWhiten(emb: DataFrame, keep: Int): DataFrame = {
    import emb.sparkSession.implicits._
    val dim = 64
    val mom = emb.select(col("embedding").cast("array<double>").as("v"))
      .as[Seq[Double]]
      .select(new graft.functions.CovMoments(dim).toColumn)
      .head()
    val cov = graft.functions.CovMoments.covarianceMatrix(mom, dim)
    val mu = graft.functions.CovMoments.means(mom, dim)
    val (eig, basis) = graft.functions.SymEigen.decompose(cov)
    require(eig(keep - 1) > 0.0,
      s"covariance rank < $keep (eig($keep)=${eig(keep - 1)}): corpus too small to whiten")
    val comps = (0 until keep).map { c =>
      val qv = basis(c)
      val meanDot = (0 until dim).map(i => mu(i) * qv(i)).sum
      val qLit = array(qv.map(lit(_)): _*)
      ((aggregate(zip_with(col("v"), qLit, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x) - lit(meanDot))
        / lit(math.sqrt(eig(c)))).as(s"y$c")
    }
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id") +: comps: _*)
      .orderBy("vec_id")
  }

  /** SemDeDup over any normed (vec_id, v, nrm) frame given cosine-
    * normalized centroids (sid, unit vector): one-pass NearestCells
    * assignment (argmax raw dot == argmax cosine because |v| is constant
    * per row; ties to the lowest INDEX, so centroids must arrive sorted
    * by sid), within-cluster near-dup pairs via a cluster equi-join, and
    * a greedy keep-lowest-id election. Shared by the q72 catalog point
    * (seed centroids) and the trained-centroid path (SimilaritySpec). */
  def semanticDedup(corpus: DataFrame, cents: Array[(Long, Array[Double])],
      tau: Double): DataFrame = {
    require(cents.sliding(2).forall(p => p.length < 2 || p(0)._1 < p(1)._1),
      "semantic_dedup: centroids must be sorted by sid (NearestCells " +
        "breaks dot ties toward the lowest index)")
    val sidArr = array(cents.map(c => lit(c._1)): _*)
    val m = corpus.withColumn("cluster",
      element_at(sidArr,
        element_at(nearestCells(col("v"), cents.map(_._2), nProbe = 1), 1)
          + 1))
    val a = m.select(col("vec_id"), col("cluster"),
      col("v").as("va"), col("nrm").as("na"))
    val b = m.select(col("vec_id").as("vb_id"), col("cluster").as("clb"),
      col("v").as("vb"), col("nrm").as("nb"))
    val drops = a.join(b,
        col("cluster") === col("clb") && col("vec_id") > col("vb_id"))
      .where(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= tau)
      .select(col("vec_id").as("dropped")).distinct()
    m.select("vec_id", "cluster")
      .join(drops, col("vec_id") === col("dropped"), "left")
      .select(col("vec_id"), col("cluster"), col("dropped").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** The q57 plan over any (vec_id, label, embedding) frame — shared with
    * the Throughput scale probe so the probe measures the exact catalog
    * plan.
    *
    * Quantize-and-split centroids: u is integer-valued (|u| <= |x|*2^24,
    * a long), hi/lo the q01 split at 1e6 — two plain codegen'd long sums,
    * exact to ~9e12 rows per (label, dim) group, order-independent.
    * DuckDB runs the IDENTICAL op sequence (its parallel unnest zips pos
    * with element), so the combine and the two divisions are bit-equal.
    * Spark pos is 0-based vs DuckDB's 1-based — consistent within each
    * engine, never exported.
    *
    * The final top-3-per-label rank plans as WindowGroupLimit (Spark
    * pushes the rnk <= 3 filter below the shuffle), so each map partition
    * forwards at most 3 rows per label to the per-label reducer — the
    * window is NOT a full per-label sort at scale. */
  def labelCentroidOutliers(embeddings: DataFrame): DataFrame = {
    val corpus = embeddings.select(
      col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm2(col("v")))
    val u = floor(col("xv") * lit(16777216.0) + lit(0.5))
    val hi = floor(col("u") / lit(1000000.0))
    val lo = (col("u") - floor(col("u") / lit(1000000.0)) * lit(1000000.0)).cast("long")
    val sums = corpus
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "xv")))
      .withColumn("u", u)
      .groupBy("label", "pos")
      .agg(sum(hi).as("hi"), sum(lo).as("lo"), count(lit(1)).as("nn"))
      .select(col("label"), col("pos"),
        (((col("hi").cast("double") * lit(1000000.0) + col("lo").cast("double"))
          / lit(16777216.0)) / col("nn")).as("c"))
    // Reassemble the centroid vector: 64 dim-partials per label — the
    // collect here is bounded by vector width by construction.
    val cents = sums.groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"),
        expr("transform(pc, s -> s.c)").as("centroid"))
      .withColumn("cnrm", norm2(col("centroid")))
    val scored = corpus.join(broadcast(cents), "label")
      .select(col("label"), col("vec_id"),
        (dot(col("v"), col("centroid")) /
          (col("nrm") * col("cnrm"))).as("cos_to_centroid"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos_to_centroid").asc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
      .orderBy("label", "rnk")
  }

  /** The q227 negative sampler: hash-pooled ring-successor election
    * (pool = r % B, succ = lexicographic struct-min with r >= p,
    * wrap = pool min), exact-dup exclusion by md5. One pool equi-join
    * with a map-side-combinable struct-min; no global sort, no
    * id-density assumption. Shared with NegativeSamplingSpec. */
  def negativeSampling(docs: DataFrame, k: Int, perPool: Long)
      : DataFrame = {
    import graft.functions.DeterministicHash
    val ids = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("sig"),
      DeterministicHash.knuth32(col("doc_id"),
        DeterministicHash.negRingSalt).as("r"))
    val nb = broadcast(ids.agg(
      least(greatest(lit(1L), expr(s"count(1) div $perPool")),
        lit(2147483647L)).cast("long").as("b")))
    val db = ids.crossJoin(nb).select(col("doc_id"), col("sig"),
      col("r"), (col("r") % col("b")).as("pool"))
    val prb = ids
      .select(col("doc_id").as("anchor_id"), col("sig").as("asig"),
        explode(sequence(lit(1L), lit(k.toLong))).as("slot"))
      .crossJoin(nb)
      .select(col("anchor_id"), col("slot"), col("asig"),
        DeterministicHash.knuth32(
          col("anchor_id") * lit((k + 1).toLong) + col("slot"),
          DeterministicHash.negProbeSalt).as("p"),
        (DeterministicHash.knuth32(
          col("anchor_id") * lit((k + 1).toLong) + col("slot"),
          DeterministicHash.negProbeSalt) % col("b")).as("pool"))
    val el = prb
      .join(db.select(col("pool"), col("r"), col("doc_id").as("i")),
        "pool")
      .groupBy("anchor_id", "slot")
      .agg(min(when(col("r") >= col("p"), struct(col("r"), col("i"))))
          .as("succ"),
        min(struct(col("r"), col("i"))).as("wrap"))
    val cand = prb.join(el, Seq("anchor_id", "slot"), "left")
      .select(col("anchor_id"), col("slot"), col("asig"),
        coalesce(col("succ"), col("wrap")).getField("i").as("cand_id"))
    val res = cand.join(
      db.select(col("doc_id").as("cand_id"), col("sig").as("nsig")),
      Seq("cand_id"), "left")
    res.select(col("anchor_id"), col("slot"),
      when(col("cand_id").isNull, "empty_bucket")
        .when(col("cand_id") === col("anchor_id")
          || col("nsig") === col("asig"), "self_or_dup")
        .otherwise("ok").as("reason"),
      when(col("cand_id").isNotNull
        && col("cand_id") =!= col("anchor_id")
        && col("nsig") =!= col("asig"), col("cand_id")).as("neg_id"))
      .orderBy("anchor_id", "slot")
  }
}
