package graft.functions

import graft.operators.DedupQueries
import graft.operators.DedupQueries.CorpusDedupIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence surface for the q75 corpus dedup index — the asset an
  * incremental-ingest pipeline builds ONCE per corpus snapshot and
  * probes with every delta (batch [[graft.operators.DedupQueries]]
  * incrementalDedupIndexed, streaming
  * [[graft.streaming.IncrementalDedupStream]]). Rebuilding the hash /
  * band / shingle frames inside every ingest (the inline q75 catalog
  * shape — correct, but it re-pays the full corpus scan + minhash per
  * delta) is what Throughput probe 8 measures as the only linear-in-
  * corpus component; this store is how a deployment amortizes it.
  *
  * Cache key = corpus content fingerprint + row count (same recipe as
  * [[AnnIndexStore]]: an ORDER-INDEPENDENT bit_xor of
  * xxhash64(doc_id, text), so partition layout cannot perturb it and any
  * doc change invalidates the entry), all encoded in the directory name.
  * A deployment with an immutable corpus-snapshot version string should
  * key on that instead ([[loadOrBuild]] accepts a caller-supplied key).
  *
  * Unlike the IVF centroid table (k rows, collected to the driver), this
  * index is CORPUS-SIZED: the three frames stay distributed parquet
  * tables under one directory —
  *
  *   <dir>/dedup_v1_<key>/hash/     (hh STRING, exact_id BIGINT)
  *   <dir>/dedup_v1_<key>/band/     (band INT, bucket BIGINT, cand_id BIGINT)
  *   <dir>/dedup_v1_<key>/shingle/  (cand_id BIGINT, sh_c ARRAY<STRING>)
  *   <dir>/dedup_v1_<key>/meta/     (n_hash, n_band, n_shingle BIGINT)
  *
  * and a load validates STRUCTURALLY (all four tables readable, schemas
  * as above, per-table _SUCCESS markers from the committed write, meta
  * row counts equal to the actual table counts). The count check costs
  * one scan of each index table — cheap next to the build (no text
  * re-hash, no minhash) and it catches the torn-directory cases a
  * marker-only check would trust; a deployment that cannot afford it can
  * key on an immutable snapshot version and trust the atomic publish.
  * Writes go through a temp dir + atomic rename ([[AtomicDir]]) so
  * readers only ever see complete indexes; a load that fails validation
  * falls back to rebuild-and-republish rather than erroring the ingest.
  */
object DedupIndexStore {

  /** Index root: SPARK_GRAFT_INDEX_DIR, else `.graft/dedup-index` under
    * the working directory (gitignored). AnnIndexStore shares the env
    * var but prefixes entries `ivf_`, so the two stores coexist. */
  def defaultDir: String =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", ".graft/dedup-index")

  /** One aggregate scan over (doc_id, text): (row count, commutative
    * content hash). */
  def fingerprint(corpus: DataFrame): (Long, Long) = {
    val r = corpus
      .agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("doc_id"), col("text"))), lit(0L)).as("fp"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** The content-derived cache key. */
  def contentKey(n: Long, fp: Long): String =
    s"fp${java.lang.Long.toHexString(fp)}_n$n"

  /** Bump when the INDEX DEFINITION changes (tokenizer, shingle width,
    * minhash family/size, banding): the corpus fingerprint cannot see
    * code changes, and a stale persisted index would otherwise be
    * silently probed with incompatible signatures. A bump orphans every
    * older-version entry (never loaded again); sweep `dedup_v<old>_*`
    * directories when rolling it out. */
  val indexFormatVersion: Int = 1

  /** Load the index for `key` if a valid one is persisted, else build it
    * via [[DedupQueries.indexCorpus]] and persist. Returns
    * (index, cacheHit). */
  def loadOrBuild(spark: SparkSession, corpus: DataFrame, key: String,
      dir: String = defaultDir): (CorpusDedupIndex, Boolean) = {
    val path = indexPath(dir, key)
    load(spark, path) match {
      case Some(idx) => (idx, true)
      case None =>
        persist(spark, path, DedupQueries.indexCorpus(corpus))
        // read the PUBLISHED copy back, so the returned frames scan
        // parquet instead of re-deriving from the corpus (and so a lost
        // publish race still returns the surviving winner's tables)
        (load(spark, path).getOrElse(throw new IllegalStateException(
          s"dedup index at $path invalid immediately after publish")), false)
    }
  }

  private def indexPath(dir: String, key: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, s"dedup_v${indexFormatVersion}_$key")

  private val subTables = Seq("hash", "band", "shingle", "meta")

  /** Valid persisted index -> Some(frames over the stored parquet);
    * anything else (absent, unreadable, wrong schema, missing _SUCCESS,
    * meta/actual count mismatch) -> None. */
  private def load(spark: SparkSession,
      path: java.nio.file.Path): Option[CorpusDedupIndex] = {
    if (!java.nio.file.Files.isDirectory(path)) None
    else scala.util.Try {
      subTables.foreach { t =>
        require(java.nio.file.Files.exists(path.resolve(t).resolve("_SUCCESS")),
          s"index table $t has no _SUCCESS marker")
      }
      val hash = spark.read.parquet(path.resolve("hash").toString)
      val band = spark.read.parquet(path.resolve("band").toString)
      val shingle = spark.read.parquet(path.resolve("shingle").toString)
      val meta = spark.read.parquet(path.resolve("meta").toString)
      require(hash.columns.toSeq == Seq("hh", "exact_id"), "hash schema")
      require(band.columns.toSeq == Seq("band", "bucket", "cand_id"), "band schema")
      require(shingle.columns.toSeq == Seq("cand_id", "sh_c"), "shingle schema")
      val m = meta.select("n_hash", "n_band", "n_shingle").head()
      require(hash.count() == m.getLong(0), "hash count drifted from meta")
      require(band.count() == m.getLong(1), "band count drifted from meta")
      require(shingle.count() == m.getLong(2), "shingle count drifted from meta")
      CorpusDedupIndex(hash, band, shingle)
    }.toOption
  }

  private def persist(spark: SparkSession, path: java.nio.file.Path,
      idx: CorpusDedupIndex): Unit = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(path.getParent)
    val tmp = AtomicDir.tmpSibling(path)
    try {
      idx.hashIndex.write.parquet(tmp.resolve("hash").toString)
      idx.bandIndex.write.parquet(tmp.resolve("band").toString)
      idx.shingleIndex.write.parquet(tmp.resolve("shingle").toString)
      // counts of the WRITTEN copies, not the build frames: the meta row
      // must describe the bytes on disk it validates
      Seq((
          spark.read.parquet(tmp.resolve("hash").toString).count(),
          spark.read.parquet(tmp.resolve("band").toString).count(),
          spark.read.parquet(tmp.resolve("shingle").toString).count()))
        .toDF("n_hash", "n_band", "n_shingle")
        .coalesce(1).write.parquet(tmp.resolve("meta").toString)
    } catch {
      case e: Throwable => AtomicDir.deleteRecursively(tmp); throw e
    }
    AtomicDir.publishValidated(tmp, path)(load(spark, path).nonEmpty)
  }
}
