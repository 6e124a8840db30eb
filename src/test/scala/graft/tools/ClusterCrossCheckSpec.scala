package graft.tools

import graft.SparkSpec

/** The q141/q143 closure cross-check (r13 verdict item 3): distributed
  * min-label propagation vs an independent driver union-find must agree
  * byte-for-byte on the full cluster assignment. This spec anchors the
  * tool at sf0.001 so the ~sf1 gate run starts from a known-green
  * instrument, and pins the premise that the check is non-vacuous
  * (real edges, real non-singleton clusters). */
class ClusterCrossCheckSpec extends SparkSpec {

  test("engine fixpoint and driver union-find agree exactly at sf0.001") {
    val r = ClusterCrossCheck.run(spark, sf0001)
    assert(r.mismatches == 0L,
      s"closures diverged on ${r.mismatches} docs")
    assert(r.docs == 500L)
    assert(r.edges > 0L, "vacuity guard: no confirmed edges means the " +
      "check compared two all-singleton assignments")
    assert(r.clusters < r.docs, "vacuity guard: some cluster must merge")
  }
}
