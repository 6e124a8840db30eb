package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence surface for the IVF coarse quantizer: train ONCE, write the
  * centroid table to parquet keyed by a corpus content fingerprint plus
  * the training parameters, and every later query LOADS instead of
  * re-running Lloyd. This is the operational half of similarity search at
  * scale — a real deployment builds the index once per corpus snapshot and
  * amortizes it over millions of probes; retraining inside every query
  * execution (the round-3 shape) charges the full k-means cost to each
  * probe batch.
  *
  * Cache key = (content fingerprint, row count, k, iterations,
  * samplePerCentroid), all encoded in the directory name. The fingerprint
  * is an ORDER-INDEPENDENT aggregate (bit_xor of xxhash64(id, vec)) so
  * partition layout cannot perturb it, and any change to ids or vector
  * content invalidates the entry. Cost: one corpus scan of (id, vec) —
  * cheap next to training, and strictly less than the probe query that
  * follows. A deployment with an immutable corpus-snapshot/version string
  * should key on that instead and skip even this scan ([[loadOrTrain]]
  * accepts a caller-supplied key for exactly that).
  *
  * Storage is a plain parquet table (cell INT, c ARRAY<DOUBLE>) — doubles
  * round-trip bit-exactly, the table is k rows (k*dim doubles; 33 MB at
  * the k=65536 cap), and any Spark/DuckDB/engine reader can inspect it.
  * Writes go through a temp dir + atomic rename so a crashed build never
  * leaves a half-written index that a later load would trust; a load that
  * fails validation (missing, wrong row count, wrong width) falls back to
  * retrain-and-rewrite rather than erroring the query.
  */
object AnnIndexStore {

  /** Index root: SPARK_GRAFT_INDEX_DIR, else `.graft/ann-index` under the
    * working directory (gitignored). */
  def defaultDir: String =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", ".graft/ann-index")

  /** One aggregate scan over (idCol, vecCol): (row count, commutative
    * content hash). bit_xor is order- and partition-independent;
    * xxhash64(id, vec) changes when any id or any vector element does. */
  def fingerprint(corpus: DataFrame, idCol: String, vecCol: String): (Long, Long) = {
    val r = corpus
      .agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col(idCol), col(vecCol))), lit(0L)).as("fp"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Load the centroid table for `key` if a valid one is persisted, else
    * train via [[AnnIndex.trainCentroidsDistributed]] and persist it.
    * Returns (centroids, cacheHit). */
  def loadOrTrain(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 10,
      samplePerCentroid: Int = 40,
      key: String,
      knownCount: Option[Long] = None,
      dir: String = defaultDir): (Array[Array[Double]], Boolean) = {
    val path = indexPath(dir, key, k, iterations, samplePerCentroid)
    load(spark, path, k) match {
      case Some(cents) => (cents, true)
      case None =>
        val t0 = System.nanoTime()
        val cents = AnnIndex.trainCentroidsDistributed(
          corpus, idCol, vecCol, k = k, iterations = iterations,
          samplePerCentroid = samplePerCentroid, knownCount = knownCount)
        persist(spark, path, cents)
        StoreEvents.record("ivf", (System.nanoTime() - t0) / 1e9)
        // eviction bound: at most AtomicDir.defaultKeep ivf entries
        // survive across fingerprints/versions (r13 verdict item 7)
        AtomicDir.pruneFamily(java.nio.file.Paths.get(dir), "ivf_v", path)
        (cents, false)
    }
  }

  /** The cache key q47 uses: content fingerprint + row count. */
  def contentKey(n: Long, fp: Long): String = s"fp${java.lang.Long.toHexString(fp)}_n$n"

  /** Bump when the TRAINING ALGORITHM changes (init, convergence,
    * normalization, NearestCells tie-breaking): the corpus fingerprint
    * and params cannot see code changes, and a stale persisted index
    * would otherwise be silently loaded — bench and recall figures would
    * then measure the OLD trainer while the source ships the new one.
    * NOTE a bump orphans every older-version entry under the index dir
    * (they are never loaded again); sweep `ivf_v<old>_*` directories as
    * part of rolling the version out. */
  val indexFormatVersion: Int = 1

  private def indexPath(dir: String, key: String, k: Int, iterations: Int,
      samplePerCentroid: Int): java.nio.file.Path =
    java.nio.file.Paths.get(dir,
      s"ivf_v${indexFormatVersion}_${key}_k${k}_i${iterations}_s$samplePerCentroid")

  /** Valid persisted index -> Some(centroids ordered by cell); anything
    * else (absent, unreadable, wrong k, ragged widths) -> None. */
  private def load(spark: SparkSession, path: java.nio.file.Path,
      k: Int): Option[Array[Array[Double]]] =
    if (!java.nio.file.Files.isDirectory(path)) None
    else scala.util.Try {
      val rows = spark.read.parquet(path.toString)
        .orderBy("cell").select("cell", "c").collect()
      require(rows.length == k, s"index has ${rows.length} cells, expected $k")
      require(rows.zipWithIndex.forall { case (r, i) => r.getInt(0) == i },
        "index cell ids are not dense 0..k-1")
      val cents = rows.map(_.getSeq[Double](1).toArray)
      val dim = cents.head.length
      require(cents.forall(_.length == dim), "index has ragged centroid widths")
      AtomicDir.touch(path) // LRU mark: loads must count as use for eviction
      cents
    }.toOption

  /** Write centroids to a temp sibling then atomically rename into place,
    * so readers only ever see complete indexes. Race/cleanup semantics
    * are [[AtomicDir.publishValidated]]'s: only a lost race is swallowed,
    * and only when the winner's index VALIDATES — a bad entry can never
    * become permanent (an unvalidated swallow would silently revert q47
    * to retrain-per-execution forever). */
  private def persist(spark: SparkSession, path: java.nio.file.Path,
      cents: Array[Array[Double]]): Unit = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(path.getParent)
    val tmp = AtomicDir.tmpSibling(path)
    try {
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "c")
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
    } catch {
      case e: Throwable => AtomicDir.deleteRecursively(tmp); throw e
    }
    AtomicDir.publishValidated(tmp, path)(load(spark, path, cents.length).nonEmpty)
  }
}
