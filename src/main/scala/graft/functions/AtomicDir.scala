package graft.functions

import java.nio.file.{FileSystemException, Files, Path, StandardCopyOption}

/** Shared atomic-directory-publish machinery for the persisted index
  * stores ([[AnnIndexStore]], [[DedupIndexStore]]): write to a tmp
  * sibling, atomically rename into place, and resolve publish races by
  * VALIDATING the winner — a lost race is only swallowed when the
  * surviving index passes the caller's validation, so a torn entry can
  * never become permanent. */
private[graft] object AtomicDir {

  /** A tmp sibling path unique across JVMs and threads: two same-process
    * threads publishing the same key must not share a tmp path (one
    * would rename the other's half-written directory). */
  def tmpSibling(path: Path): Path =
    path.resolveSibling(path.getFileName.toString +
      s".tmp-${ProcessHandle.current.pid}-${Thread.currentThread().getId}-${System.nanoTime()}")

  /** Publish `tmp` (a fully-written directory) at `path`. On a lost race
    * (the target appearing first), keep the winner only if
    * `survivorValid` holds; replace it with ours otherwise — and swallow
    * only a SECOND race after the replacement attempt. Any other failure
    * propagates. `tmp` is always cleaned up.
    *
    * Race detection must catch more than FileAlreadyExistsException /
    * DirectoryNotEmptyException: a POSIX rename(2) onto an existing
    * non-empty directory under ATOMIC_MOVE surfaces as the GENERIC
    * FileSystemException (ENOTEMPTY is not mapped to the subclass on
    * this path), so the guard is "any FileSystemException while the
    * target exists". A FileSystemException with NO target present is a
    * real failure and propagates. */
  def publishValidated(tmp: Path, path: Path)(survivorValid: => Boolean): Unit =
    try {
      try moveInto(tmp, path)
      catch {
        case _: FileSystemException if Files.exists(path) =>
          if (!survivorValid) {
            deleteRecursively(path)
            try moveInto(tmp, path)
            catch {
              case _: FileSystemException if Files.exists(path) => ()
            }
          }
      }
    } finally deleteRecursively(tmp)

  /** Atomic rename when the FS supports it, plain move otherwise (store
    * loads validate content, so a torn non-atomic move is rejected ->
    * rebuild, never trusted). */
  def moveInto(tmp: Path, path: Path): Unit =
    try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, path)
    }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
    }

  /** Per-family entry bound for every persisted store (r13 verdict
    * item 7): keep at most this many entries per family prefix; a new
    * publish evicts the stalest beyond the bound. Families are
    * code-bounded (one per kind x format-version), so a long-lived
    * store directory holds at most keep * |families| entries — it can
    * never grow without limit as data snapshots roll. Override with
    * SPARK_GRAFT_STORE_KEEP (min 1). */
  val defaultKeep: Int = math.max(1,
    sys.env.get("SPARK_GRAFT_STORE_KEEP")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(4))

  /** Mark a store entry USED so pruneFamily's newest-first ranking is
    * true LRU: publish sets mtime once, but a bench-critical entry
    * (q47's sf0.1 index, q237's pair matrix) is LOADED every session
    * and republished never — without this touch, a probe run
    * publishing a few throwaway fingerprints could evict the hottest
    * entry in the family purely by being younger. Best-effort: a
    * failed touch only weakens the ranking, never correctness. */
  def touch(path: Path): Unit =
    try Files.setLastModifiedTime(path,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Throwable => () }

  /** Evict stale same-family entries after a successful publish: under
    * `dir`, directories whose name starts with `familyPrefix` (never
    * in-flight ".tmp-" siblings, never the just-published `keepPath`)
    * are ranked newest-first by last-modified time and all but the
    * newest keep-1 besides keepPath are deleted. Safe under races by
    * the stores' existing contract: a reader whose entry vanishes
    * mid-load fails that load's Try/validation and falls back to
    * rebuild-and-republish — eviction can cost a rebuild, never a
    * wrong result. Entries are only at risk when a NEW fingerprint
    * publishes into the family (a rolled data snapshot / version
    * bump); steady-state sessions re-load existing entries and never
    * trigger eviction. Per-entry delete failures are swallowed (a
    * concurrent pruner may have won); directory-level IO failures are
    * swallowed too — eviction is best-effort hygiene, the publish it
    * follows has already succeeded. */
  def pruneFamily(dir: Path, familyPrefix: String, keepPath: Path,
      keep: Int = defaultKeep): Unit =
    try {
      if (Files.isDirectory(dir)) {
        val listing = Files.list(dir)
        val entries =
          try {
            val it = listing.iterator()
            val buf = Vector.newBuilder[Path]
            while (it.hasNext) {
              val p = it.next()
              val name = p.getFileName.toString
              if (Files.isDirectory(p) && name.startsWith(familyPrefix) &&
                  !name.contains(".tmp-") &&
                  name != keepPath.getFileName.toString)
                buf += p
            }
            buf.result()
          } finally listing.close()
        val byAge = entries.sortBy(p =>
          -scala.util.Try(Files.getLastModifiedTime(p).toMillis)
            .getOrElse(0L))
        byAge.drop(math.max(0, keep - 1)).foreach(p =>
          scala.util.Try(deleteRecursively(p)))
      }
    } catch { case _: java.io.IOException => () }
}
