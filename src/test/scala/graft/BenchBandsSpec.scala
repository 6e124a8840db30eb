package graft

import org.scalatest.funsuite.AnyFunSuite

/** Band parsing + aging contract (r13 verdict item 4): Bench reads the
  * SURVEY §12 audit table as its steady-band expectation source, now
  * including a per-band ROUND STAMP so stale bands can self-refresh in
  * the line of record instead of shipping a false out-of-band label
  * (q163's r13 incident: the only n_oob of the closing shot was a band
  * nobody had re-measured since the query's cost legitimately moved). */
class BenchBandsSpec extends AnyFunSuite {

  private val table = Seq(
    "| query | module | oracle status | sf0.1 s |",
    "|---|---|---|---|",
    "| `q01_pricing_summary` | RelationalQueries | hash-green (r7 driver; r8 selfcheck) | 0.95 |",
    "| `q05_join_left_outer` | RelationalQueries | hash-green (r7 driver; r8 selfcheck) | 0.45-0.55 (r13 idle steady) |",
    "| `q36_dedup_simhash` | DedupQueries | hash-green (r12 conversion) | 2.48-2.77 (r12 idle steady; one pass) |",
    "| `q40_new_query` | MultimodalQueries | hash-green | — (new) |",
    "| `q41_approx` | WarehouseQueries | hash-green | ~0.62 (r11 idle steady) |")

  test("bands parse with round stamps from the BAND cell only") {
    val (bands, stamps) = Bench.parseBands(table)
    assert(bands("q01_pricing_summary") == ((0.95, 0.95)))
    assert(bands("q05_join_left_outer") == ((0.45, 0.55)))
    assert(bands("q36_dedup_simhash") == ((2.48, 2.77)))
    assert(bands("q41_approx") == ((0.62, 0.62)))
    assert(!bands.contains("q40_new_query"), "dash cells carry no band")
    // the oracle cell's (r7/r12 ...) vintages must NOT leak into stamps
    assert(stamps("q01_pricing_summary") == 8,
      "unstamped band cell = table column vintage r8, not the oracle cell's r7")
    assert(stamps("q05_join_left_outer") == 13)
    assert(stamps("q36_dedup_simhash") == 12)
    assert(stamps("q41_approx") == 11)
  }

  test("the shipping SURVEY.md parses to the full banded catalog") {
    val lines = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("SURVEY.md")).asScala.toSeq
    }
    val (bands, stamps) = Bench.parseBands(lines)
    assert(bands.size >= 260, s"expected the full catalog, got ${bands.size}")
    assert(bands.keySet == stamps.keySet)
    assert(stamps.values.max >= 13, "table vintage must track the newest round")
    assert(bands.forall { case (_, (lo, hi)) => lo <= hi && lo > 0 })
  }
}
