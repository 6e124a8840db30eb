package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF index build: spherical k-means producing the L2-normalized
  * centroid table the [[graft.expressions.NearestCells]] expression
  * assigns against.
  *
  * Two trainers, one contract:
  *
  *   - [[trainCentroids]] — driver-local Lloyd over a bounded collect.
  *     DOCUMENTED CEILING: k*dim plus sampleCap*dim doubles must fit on
  *     the driver; with the 4096-row default cap it cannot train past
  *     k ≈ 4096/40 ≈ 100 meaningful cells. Demo/test scale only.
  *   - [[trainCentroidsDistributed]] — the 100 TB path. The sample stays
  *     a DataFrame; every Lloyd round is (narrow NearestCells assignment)
  *     -> (one hash aggregation via the typed VecMeanAggregator). The
  *     driver only ever holds the k centroid vectors (k*dim doubles, e.g.
  *     k=10^5 x 64 dims = 51 MB at the extreme), never the sample. This
  *     trains the k ≈ sqrt(N) cell counts a real deployment needs
  *     (k=256 on a 100k corpus is exercised in AnnIndexSpec).
  *
  * Sizing rules ([[chooseK]] / [[chooseNProbe]]): k ≈ sqrt(N) balances
  * cells-scanned-per-probe (N/k) against centroid-table size (k); the
  * sample is samplePerCentroid*k (default 40x — below ~40 observations
  * per centroid, empty/starved cells dominate); probes default to 5% of
  * cells, the IVF operating point where recall is bought by cluster
  * locality rather than scan fraction.
  */
object AnnIndex {

  /** IVF cell count for a corpus of n vectors: k ≈ sqrt(n), clamped to
    * [1, maxK]. The standard IVF sizing rule — per-probe work is
    * n/k + k, minimized at sqrt(n). */
  def chooseK(corpusRows: Long, maxK: Int = 1 << 16): Int = {
    require(corpusRows >= 0, s"chooseK: negative corpus size $corpusRows")
    math.min(maxK.toLong, math.max(1L, math.round(math.sqrt(corpusRows.toDouble)))).toInt
  }

  /** Probe budget: scanFraction of the k cells, at least 1. */
  def chooseNProbe(k: Int, scanFraction: Double = 0.05): Int = {
    require(scanFraction > 0 && scanFraction <= 1.0, s"bad scanFraction $scanFraction")
    math.max(1, math.min(k, math.ceil(k * scanFraction).toInt))
  }

  /** Corpus-aware probe budget: the 5%-of-cells rule, with two FLOORS
    * that only bind at small corpora.
    *
    *   - CANDIDATE floor: probe enough cells that the expected scan
    *     covers at least ~50*topK vectors — keeps the re-rank fed when 5%
    *     of a demo corpus is a couple dozen candidates.
    *   - SMALL-CORPUS SCAN floor: below [[smallCorpusRows]] vectors,
    *     probe at least [[smallCorpusScanFraction]] of the cells. At that
    *     size each cell holds only ~sqrt(N) ≈ tens of vectors and the
    *     quantizer has little cluster structure to exploit, so recall
    *     tracks scan fraction near-linearly (measured: 13% of cells ->
    *     recall@5 0.48 at sf0.1, round 3's regression; 31% -> 0.72 in
    *     round 2) — the 5% rule buys recall by locality only once cells
    *     are populous enough to BE local.
    *
    * At 100 TB both floors are irrelevant (5% of the corpus dwarfs
    * them); they exist so small-corpus operating points degrade to
    * "scan a meaningful fraction" instead of "scan 3 starved cells". */
  def chooseNProbeFor(k: Int, corpusRows: Long, topK: Int = 5,
      scanFraction: Double = 0.05): Int = {
    val floorRows = 50L * topK
    val floorCells =
      if (corpusRows <= 0) 1
      else math.ceil(k.toDouble * floorRows / corpusRows).toInt
    val smallCells =
      if (corpusRows > 0 && corpusRows < smallCorpusRows)
        math.ceil(k * smallCorpusScanFraction).toInt
      else 0
    math.min(k, math.max(chooseNProbe(k, scanFraction),
      math.max(smallCells, math.max(1, floorCells))))
  }

  /** Below this corpus size the small-corpus scan floor applies. */
  val smallCorpusRows: Long = 10000L

  /** Scan fraction the small-corpus floor enforces (see chooseNProbeFor). */
  val smallCorpusScanFraction: Double = 0.30

  /** Distributed spherical k-means: the sample never leaves the cluster.
    *
    * Deterministic sampling and init given the corpus: hash-stride sample
    * (uniform for any id distribution), xxhash-ordered init (a
    * deterministic pseudo-random draw of k vectors), BOUNDED iteration
    * count with a convergence early-exit. Per-round double-sum order
    * inside VecMeanAggregator follows partition order, so repeated runs
    * can differ in final float ulps — and a `moved` value hovering at the
    * exit threshold can then cross it on different rounds, so run-to-run
    * divergence is ulp-scale but not bit-zero. Callers needing bit-stable
    * centroids across runs use trainCentroids (driver fold, ordered,
    * fixed rounds).
    *
    * Cost model at 100 TB: one pruned-column scan to sample (predicate on
    * xxhash64(id) only), then `iterations` jobs over the CACHED sample of
    * ~samplePerCentroid*k rows — corpus-size-independent after the first
    * scan. Assignment inside each round is the narrow NearestCells
    * expression; the aggregation ships one vector per partition per cell.
    */
  def trainCentroidsDistributed(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 10,
      samplePerCentroid: Int = 40,
      // pass the corpus row count when the caller already has it (e.g.
      // ivfTopKAuto counted to size k) — skips a redundant full scan
      knownCount: Option[Long] = None): Array[Array[Double]] = {
    require(k >= 1, s"k-means: k=$k")
    val target = k.toLong * samplePerCentroid
    val cnt = knownCount.getOrElse(corpus.count())
    val stride = math.max(1L, cnt / math.max(1L, target))
    // Normalize on the executors. transform() is an interpreted HOF — fine
    // here because it runs over the bounded training sample only, never
    // the corpus (the hot-path normalization in queries uses native
    // VecDot/Cast); inlining it keeps this method dependency-free.
    val sample = corpus
      .where(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__raw"))
      .withColumn("__nrm", VectorFunctions.norm2(col("__raw")))
      .where(col("__nrm") > 0)
      .select(col("__id"),
        expr("transform(__raw, x -> x / __nrm)").as("__v"))
      .cache()
    try {
      val sampleN = sample.count()
      require(sampleN >= k,
        s"k-means: sample $sampleN < k=$k — corpus too small for this cell " +
          "count (chooseK would have picked a smaller k)")
      // init: first k vectors in xxhash order = a deterministic uniform draw
      var cents: Array[Array[Double]] = sample
        .orderBy(xxhash64(col("__id")), col("__id")).limit(k)
        .select("__v").collect().map(_.getSeq[Double](0).toArray)
      val meanVec = udaf(VecMeanAggregator,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
      var it = 0
      var moved = Double.MaxValue
      // early exit once centroids stop moving (normalized vectors: the
      // max per-coordinate delta bounds the rotation) — on clustered
      // corpora Lloyd converges in 3-5 rounds, so this typically halves
      // the index-build cost without changing the result
      while (it < iterations && moved > 1e-9) {
        val means = sample
          .select(element_at(
            VectorFunctions.nearestCells(col("__v"), cents, 1), 1).as("cell"),
            col("__v"))
          .groupBy("cell").agg(meanVec(col("__v")).as("m"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        val next = Array.tabulate(k) { c =>
          means.get(c).filter(_.nonEmpty).map(normalize).getOrElse(cents(c))
        }
        moved = 0.0
        var c = 0
        while (c < k) {
          val a = cents(c); val b = next(c)
          var j = 0
          while (j < a.length) {
            val d = math.abs(a(j) - b(j)); if (d > moved) moved = d; j += 1
          }
          c += 1
        }
        cents = next
        it += 1
      }
      cents
    } finally { sample.unpersist(); () }
  }

  /** Train `k` spherical k-means centroids over `corpus` (columns: idCol,
    * vecCol ARRAY<DOUBLE>). Deterministic: hash-stride sample (uniform
    * for ANY id distribution — dense, sparse, offset, all-odd — where a
    * raw `id % stride` would bias or select nothing), hard-capped at
    * sampleCap rows by limit, stride-k init, fixed iteration count, ties
    * to the lower cell. Returns L2-normalized centroids. */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 10,
      sampleCap: Int = 4096): Array[Array[Double]] = {
    var sample = trainingSample(corpus, idCol, vecCol, sampleCap)
    if (sample.length < k) {
      // hash-unlucky tiny selection: fall back to the deterministic
      // id-ordered prefix (still <= sampleCap rows)
      sample = corpus.orderBy(col(idCol)).limit(sampleCap)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Double](0).toArray).map(normalize)
    }
    require(sample.length >= k, s"k-means: sample ${sample.length} < k=$k")
    // Same loud-failure contract as NearestCells: a width-mismatched
    // vector would otherwise skew a centroid via a silently truncated
    // prefix sum here, then throw far away at assignment time.
    val dim = sample(0).length
    sample.zipWithIndex.foreach { case (v, i) =>
      require(v.length == dim,
        s"k-means: sample vector $i has ${v.length} elements, expected $dim")
    }

    // stride init over the (id-ordered) sample — deterministic
    var cents: Array[Array[Double]] =
      Array.tabulate(k)(i => sample((i.toLong * sample.length / k).toInt).clone())
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(k)(new Array[Double](cents(0).length))
      val ns = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(v, cents)
        addInto(sums(c), v)
        ns(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (ns(c) == 0) cents(c) // empty cell keeps its old centroid
        else normalize(sums(c).map(_ / ns(c)))
      }
      it += 1
    }
    cents
  }

  /** The bounded deterministic training sample: hash-stride selection,
    * id-ordered, HARD-capped at sampleCap rows by limit() — the collect
    * bound the 100 TB claim depends on. private[graft] so the cap is
    * testable as a contract. */
  private[graft] def trainingSample(
      corpus: DataFrame, idCol: String, vecCol: String,
      sampleCap: Int,
      // callers that already counted (fingerprint paths) skip the scan
      knownCount: Option[Long] = None): Array[Array[Double]] = {
    val cnt = knownCount.getOrElse(corpus.count())
    // ceil so the expected selection is <= sampleCap
    val stride = math.max(1L, (cnt + sampleCap - 1) / sampleCap)
    corpus
      .where(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
      .orderBy(col(idCol))
      .limit(sampleCap)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .map(normalize)
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var dot = 0.0
      var j = 0
      val cv = cents(c)
      while (j < v.length && j < cv.length) { dot += v(j) * cv(j); j += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  private def addInto(acc: Array[Double], v: Array[Double]): Unit = {
    var j = 0
    while (j < acc.length && j < v.length) { acc(j) += v(j); j += 1 }
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var j = 0
    while (j < v.length) { s += v(j) * v(j); j += 1 }
    val n = math.sqrt(s)
    if (n == 0.0 || n.isNaN) v else v.map(_ / n)
  }
}
