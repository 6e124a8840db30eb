package graft.functions

/** Process-wide ledger of persisted-store BUILD events (cache misses
  * that ran real work): every [[FrameStore]]/[[SketchStore]]/
  * [[AnnIndexStore]] miss records (kind, build seconds) here.
  *
  * Why it exists (VERDICT r14 item 1): BENCH_r14's driver shot paid
  * q237's 28.5 s cold FrameStore build INSIDE the timed window, and
  * nothing in the line of record said so — the headline depended on
  * invisible cross-session state. Bench now (a) warms every store at
  * the timed SF before the clock starts ([[graft.StoreWarmup]]),
  * reporting the build costs as their own metric, and (b) snapshots
  * this ledger around every timed shot so a residual in-shot miss
  * ships as an explicit `store_miss` split instead of silently
  * inflating the query figure.
  *
  * Recording is unconditional — a build is rare (once per content
  * fingerprint) and the append is O(1) — so the evidence exists even
  * in sessions that never asked for it. Bounded: the ledger is capped
  * at 4096 entries (a long-lived service session cannot grow it
  * without bound); the monotone counter keeps window deltas correct
  * past the cap.
  */
object StoreEvents {

  final case class Build(kind: String, sec: Double)

  private val maxEntries = 4096
  private val lock = new Object
  private var entries = Vector.empty[Build]
  private var total = 0L

  private[functions] def record(kind: String, sec: Double): Unit =
    lock.synchronized {
      if (entries.length < maxEntries) entries = entries :+ Build(kind, sec)
      total += 1
    }

  /** Monotone count of builds recorded so far — snapshot before/after
    * a timed region; a delta > 0 means the region paid store-build
    * work. */
  def count: Long = lock.synchronized(total)

  /** Ledger entries from index `from` (as returned by a prior
    * [[count]]) to now — the builds a timed region paid. Entries past
    * the cap are not retained (the delta in [[count]] still is). */
  def since(from: Long): Seq[Build] = lock.synchronized {
    if (from >= entries.length) Seq.empty
    else entries.drop(math.max(0, from.toInt))
  }
}
