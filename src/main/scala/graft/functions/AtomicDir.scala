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
}
