package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence surface for per-partition KMV sketch partials (q211's
  * lifecycle): build ONCE per content snapshot, write the partial table
  * to parquet keyed by a content fingerprint, and every later read
  * LOADS instead of re-scanning the base keys. [[AnnIndexStore]]'s
  * contract applied to sketches — the partial table is the thing a
  * deployment persists (it is k rows per partition regardless of
  * partition size) and refreshes incrementally from a change feed,
  * never rebuilds from the base table.
  *
  * Staleness contract: the cache key is an ORDER-INDEPENDENT content
  * fingerprint (row count + bit_xor of xxhash64(g, hv)) of the hashed
  * key stream, so any insert/delete/rebucketing invalidates the entry
  * and partition layout cannot perturb it; a format-version bump
  * orphans older entries when the partial SHAPE changes. Writes go
  * through [[AtomicDir]] (tmp sibling + atomic rename + validated
  * publish), so a crashed build never leaves a half-written table a
  * later load would trust; a load that fails validation falls back to
  * rebuild-and-rewrite rather than erroring the query.
  */
object SketchStore {

  /** Store root: SPARK_GRAFT_SKETCH_DIR, else `.graft/sketch-partials`
    * under the working directory (gitignored). */
  def defaultDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SKETCH_DIR", ".graft/sketch-partials")

  /** Bump when the partial layout changes (hash family, k, column
    * shape): the content fingerprint cannot see code changes. */
  val formatVersion: Int = 1

  /** Load the partial table for the hashed key stream `hashed`
    * (columns g: long bucket, hv: long hash) if a valid one is
    * persisted under its content fingerprint, else build it via
    * `buildPartials` and persist. Returns the partials frame —
    * identical values on hit and miss, so callers are
    * storage-transparent. */
  def loadOrBuild(
      spark: SparkSession,
      hashed: DataFrame,
      buildPartials: DataFrame => DataFrame,
      dir: String = defaultDir): DataFrame = {
    val r = hashed
      .agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("g"), col("hv"))), lit(0L)).as("fp"))
      .head()
    val (n, fp) = (r.getLong(0), r.getLong(1))
    val path = java.nio.file.Paths.get(dir,
      s"kmv_v${formatVersion}_fp${java.lang.Long.toHexString(fp)}_n$n")
    load(spark, path).getOrElse {
      val t0 = System.nanoTime()
      val parts = buildPartials(hashed)
      persist(spark, path, parts)
      StoreEvents.record("kmv", (System.nanoTime() - t0) / 1e9)
      // eviction bound: at most AtomicDir.defaultKeep kmv entries
      // survive across fingerprints/versions (r13 verdict item 7)
      AtomicDir.pruneFamily(java.nio.file.Paths.get(dir), "kmv_v", path)
      // read back the published table so hit and miss return the same
      // physical source (and a racing winner's table is what's used)
      load(spark, path).getOrElse(parts)
    }
  }

  /** Valid persisted partials -> Some(frame); absent/unreadable/wrong
    * shape -> None. */
  private def load(spark: SparkSession, path: java.nio.file.Path)
      : Option[DataFrame] =
    if (!java.nio.file.Files.isDirectory(path)) None
    else scala.util.Try {
      val df = spark.read.parquet(path.toString)
      require(df.columns.sorted.sameElements(Array("g", "hv")),
        s"partials at $path have columns ${df.columns.mkString(",")}")
      AtomicDir.touch(path) // LRU mark: loads must count as use for eviction
      df.select(col("g").cast("long").as("g"),
        col("hv").cast("long").as("hv"))
    }.toOption

  private def persist(spark: SparkSession, path: java.nio.file.Path,
      parts: DataFrame): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    val tmp = AtomicDir.tmpSibling(path)
    try {
      parts.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    } catch {
      case e: Throwable => AtomicDir.deleteRecursively(tmp); throw e
    }
    AtomicDir.publishValidated(tmp, path)(load(spark, path).nonEmpty)
  }
}
