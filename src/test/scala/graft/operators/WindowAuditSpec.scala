package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical

/** CATALOG-WIDE single-partition-window audit (VERDICT r12 item 1).
  *
  * An unpartitioned `Window.orderBy` plans as `Exchange
  * SinglePartition` — one task sorts the whole frame. That is fine
  * when the frame is provably bounded (a `limit(k)` sits below the
  * window, or the frame is a fixed small domain) and a scale-killer
  * when the frame grows with the corpus (the former q106/q187/q195,
  * and r12's q99/q212 — both converted to RangeRank this round).
  *
  * This suite pins the rule for EVERY catalog query, not just the
  * ones already caught: any optimized plan containing a Window with
  * an empty partitionSpec must either (a) have a GlobalLimit below
  * the window — the rank-after-top-k pattern, frame is k rows by
  * construction — or (b) appear on the explicit allowed list below
  * with a reason proving the frame is bounded by a LITERAL domain
  * (never by corpus size). A new query with an unbounded global
  * window fails here before it ships; an allowed-list entry whose
  * window disappears is flagged stale so the list cannot rot.
  */
class WindowAuditSpec extends SparkSpec {

  /** Queries whose unpartitioned windows run over frames bounded by a
    * fixed domain or literal, never by corpus size. Each entry names
    * the bound; the frame size is independent of corpus row count at
    * any SF (calendar days/months, value domains with hard caps,
    * |event types|, |sources|, |strata|, literal shard/bucket counts).
    * Sites over frames that GROW with the corpus are NOT allowable —
    * they convert to RangeRank (q106/q187/q195 in r11; q99/q212/q111/
    * q142 in r13). */
  private val allowed: Map[String, String] = Map(
    "q109_concurrency_profile" ->
      "two-level prefix: global window only over per-day totals (calendar-bounded)",
    "q117_cumulative_uniques" ->
      "running sum over the day dimension (calendar-bounded)",
    "q152_compaction_plan" ->
      "packing window over per-month file stats (calendar-bounded)",
    "q173_seasonal_decomposition" ->
      "centered-MA windows over the month frame (calendar-bounded, ~80 rows/decade)",
    "q207_theil_sen" ->
      "pair ranks over the 30-day monitoring grid (<=435 pair rows at any SF)",
    "q69_sequence_packing" ->
      "two-level prefix: global window only over 1-row-per-shard totals (literal shard count)",
    "q182_ks_two_sample" ->
      "two-level ECDF prefix: global window only over per-shard totals (shard = cents DIV 10000)",
    "q183_mann_whitney_u" ->
      "same value-aggregated shard frame as q182 (per-shard totals only)",
    "q234_cramer_von_mises" ->
      "same value-aggregated shard frame as q182 (per-shard totals only)",
    "q198_feature_auc" ->
      "cumulative window over the distinct token-count domain (bounded by the doc length cap)",
    "q202_spearman_rho" ->
      "rank windows over the <=50 quantity / <=11 discount marginals (TPC-H value domains)",
    "q216_bh_fdr" ->
      "BH step-up windows over the m = |event types| p-value frame",
    "q224_isotonic_calibration" ->
      "PAV minimax over the constant 11-bin reliability grid",
    "q229_token_waterfill" ->
      "waterfill sort/prefix over the |domains|-row frame",
    "q230_decision_stump" ->
      "threshold prefix sums over the distinct feature-value domain (stopword hits, capped)",
    "q233_shuffle_runs_audit" ->
      "boundary resolution over the literal 4096-bucket (first,last)-source summary",
    "q238_hamilton_apportionment" ->
      "remainder rank over the |strata|-row apportionment frame",
    "q246_quantile_normalization" ->
      "domain cumulative window over the distinct token-count frame (length-capped)",
    "q264_neyman_allocation" ->
      "Hamilton remainder rank over the |strata|-row frame (the q238 shape)")

  test("every unpartitioned window in the catalog is bounded or allowed") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val stale = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf0001)
      val unbounded = df.queryExecution.optimizedPlan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty &&
          w.collectFirst { case _: logical.GlobalLimit => () }.isEmpty => w
      }
      if (unbounded.nonEmpty && !allowed.contains(name))
        offenders += s"$name (${unbounded.size} window(s))"
      if (unbounded.isEmpty && allowed.contains(name))
        stale += name
    }
    assert(offenders.isEmpty,
      "unpartitioned windows over frames not proven bounded — convert " +
        "to RangeRank or add an allowed-list entry with the literal " +
        s"bound:\n  ${offenders.mkString("\n  ")}")
    assert(stale.isEmpty,
      "allowed-list entries whose window no longer exists (stale):\n  " +
        stale.mkString("\n  "))
  }
}
