package graft

/** Every declared query must run green at sf0.001 and (except for
  * queries whose predicate legitimately selects nothing at tiny scale)
  * produce rows. The driver's DuckDB hash-compare at sf0.01 is the strong
  * gate; this is the fast local guard.
  */
class QueriesSmokeSpec extends SparkSpec {

  // Queries allowed to be empty at sf0.001 (selective predicates over a
  // 150-customer universe); they are non-empty at the sf0.01 gate.
  private val mayBeEmptyAtTinySf = Set("q07_join_anti")

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  SparkEntry.catalog.foreach { case (name, q) =>
    test(s"$name runs at sf0.001") {
      val df = q.fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmptyAtTinySf(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
