package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic anchors for the q88 referential-integrity audit and the q89
  * column profile: planted orphans/nulls are counted exactly, and the
  * profile matches directly computed statistics.
  */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("integrity audit counts planted orphans and nulls exactly") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(8L), None)
      .toDF("fk")
    val out = ExtendedQueries.integrityAudit(
      "child.fk->parent", child, "fk", parent, "pk", broadcastParent = true)
      .collect().head
    assert(out.getString(0) == "child.fk->parent")
    assert(out.getLong(1) == 6L, "n_child counts every row incl. null keys")
    assert(out.getLong(2) == 1L, "one NULL key")
    assert(out.getLong(3) == 2L, "9 and 8 are orphans; null is NOT an orphan")
  }

  test("clean relationship audits to zero orphans") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1L, 2L, 2L, 2L).toDF("fk")
    val out = ExtendedQueries.integrityAudit(
      "c->p", child, "fk", parent, "pk", broadcastParent = false)
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == ((4L, 0L, 0L)))
  }

  test("real schema: all seven relationships are clean (the generator's contract)") {
    val out = SparkEntry.queries("q88_referential_integrity")(spark, sf001)
      .collect()
    assert(out.length == 7)
    out.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
        s"${r.getString(0)}: nulls=${r.getLong(2)} orphans=${r.getLong(3)}")
      assert(r.getLong(1) > 0L)
    }
  }

  test("column profile equals directly computed statistics") {
    val o = graft.Tables.orders(spark, sf001)
    val prof = SparkEntry.queries("q89_column_profile")(spark, sf001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("o_orderkey", "o_custkey", "o_totalprice",
      "o_orderstatus", "o_orderdate"))
    val n = o.count()
    val k = prof("o_orderkey")
    assert(k.getLong(1) == n && k.getLong(2) == 0L)
    assert(k.getLong(3) == n, "order keys are unique")
    val direct = o.agg(min("o_orderkey").cast("double"),
      max("o_orderkey").cast("double"),
      count_distinct(col("o_orderstatus"))).head()
    assert(k.getDouble(4) == direct.getDouble(0)
      && k.getDouble(5) == direct.getDouble(1))
    val st = prof("o_orderstatus")
    assert(st.getLong(3) == direct.getLong(2))
    assert(st.isNullAt(4) && st.isNullAt(5), "text column has no numeric bounds")
    val dt = prof("o_orderdate")
    assert(dt.getString(6).matches("\\d{4}-\\d{2}-\\d{2}"), dt.getString(6))
  }
}
