package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic fingerprint-keyed persistence for EXPENSIVE DERIVED FRAMES —
  * [[SketchStore]]'s lifecycle contract (content fingerprint, atomic
  * publish, validate-or-rebuild) generalized from KMV partials to any
  * deterministic projection of a base stream. First user: q237's
  * Laplace-smoothed duel-pair matrix, whose one-time build (per-order
  * duel self-join + pair aggregate, ~6.5 s at sf0.1) dominated a fresh
  * session's first shot; a deployment builds it once per data snapshot
  * and every later session pays one cheap fingerprint scan + a parquet
  * load (VERDICT r11 item 5).
  *
  * Staleness contract: the cache key is an ORDER-INDEPENDENT content
  * fingerprint — row count + bit_xor + wrapping-sum of
  * xxhash64(every fingerprint column) — of the base projection the
  * derived frame is a pure function of, so partition layout cannot
  * perturb it and realistic edits invalidate the entry. XOR alone was
  * blind to paired changes among identical rows (the base projection
  * may legitimately hold duplicates; updating an EVEN number of
  * duplicates uniformly cancels in XOR and preserves count — ADVICE
  * r12); the wrapping sum sees multiplicity, so defeating BOTH limbs
  * plus the count requires an engineered multiset collision, not an
  * even-duplicate edit. The caller's `version` bumps
  * orphan older entries when the derived SHAPE or build algebra
  * changes (the fingerprint cannot see code). Writes go through
  * [[AtomicDir]] (tmp sibling + atomic rename + validated publish);
  * a load that fails validation falls back to rebuild-and-rewrite.
  *
  * Scale shape: the fingerprint is one combinable aggregate over the
  * base projection (map-side partials, one row out); the store holds
  * the DERIVED frame — orders of magnitude smaller than its input —
  * written with its natural partitioning (never coalesced to one
  * file: the derived frame, unlike a k-row sketch, can be large).
  */
object FrameStore {

  /** Store root: SPARK_GRAFT_FRAME_DIR, else `.graft/frame-store`
    * under the working directory (gitignored). */
  def defaultDir: String =
    sys.env.getOrElse("SPARK_GRAFT_FRAME_DIR", ".graft/frame-store")

  /** Order-independent content fingerprint of `base`: (rowCount,
    * bit_xor of xxhash64 over all columns, wrapping sum of the same
    * hashes). Still one combinable scan; XOR and sum are both
    * commutative/associative and Java long addition wraps
    * deterministically, so partitioning cannot perturb either limb. */
  def fingerprint(base: DataFrame): (Long, Long, Long) = {
    val cols = base.columns.map(col).toSeq
    val h = xxhash64(cols: _*)
    val r = base.agg(count(lit(1)).as("n"),
      coalesce(bit_xor(h), lit(0L)).as("fp"),
      coalesce(sum(h), lit(0L)).as("fs")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Load the derived frame `kind` (shape `version`) keyed by the
    * content fingerprint of `base` if a valid one is persisted, else
    * run `build` and persist it. Hit and miss return identical
    * values; the hit additionally reads from the published parquet so
    * both paths share one physical source. `expectCols` validates a
    * loaded table's column set — a mismatch (older shape, torn write)
    * is treated as absent and rebuilt, never trusted. */
  def loadOrBuild(spark: SparkSession, kind: String, version: Int,
      base: DataFrame, expectCols: Seq[String],
      dir: String = defaultDir)(build: => DataFrame): DataFrame = {
    val (n, fp, fs) = fingerprint(base)
    val path = java.nio.file.Paths.get(dir,
      s"${kind}_v${version}_fp${java.lang.Long.toHexString(fp)}" +
        s"_fs${java.lang.Long.toHexString(fs)}_n$n")
    load(spark, path, expectCols).getOrElse {
      val t0 = System.nanoTime()
      val built = build
      persist(spark, path, built, expectCols)
      StoreEvents.record(s"frame:$kind", (System.nanoTime() - t0) / 1e9)
      // eviction bound (AtomicDir.pruneFamily): at most defaultKeep
      // entries per kind survive across fingerprints AND versions —
      // `${kind}_v` groups rolled snapshots and orphaned old shapes
      // into one family, so neither growth mode is unbounded
      AtomicDir.pruneFamily(java.nio.file.Paths.get(dir), s"${kind}_v", path)
      load(spark, path, expectCols).getOrElse(built)
    }
  }

  private def load(spark: SparkSession, path: java.nio.file.Path,
      expectCols: Seq[String]): Option[DataFrame] =
    if (!java.nio.file.Files.isDirectory(path)) None
    else scala.util.Try {
      val df = spark.read.parquet(path.toString)
      require(df.columns.sorted.toSeq == expectCols.sorted,
        s"frame at $path has columns ${df.columns.mkString(",")}")
      AtomicDir.touch(path) // LRU mark: loads must count as use for eviction
      df
    }.toOption

  private def persist(spark: SparkSession, path: java.nio.file.Path,
      frame: DataFrame, expectCols: Seq[String]): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    val tmp = AtomicDir.tmpSibling(path)
    try {
      frame.write.mode("overwrite").parquet(tmp.toString)
    } catch {
      case e: Throwable => AtomicDir.deleteRecursively(tmp); throw e
    }
    AtomicDir.publishValidated(tmp, path)(
      load(spark, path, expectCols).nonEmpty)
  }
}
