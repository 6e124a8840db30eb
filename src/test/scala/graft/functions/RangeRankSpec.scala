package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RangeRank must equal the single-partition window form ROW FOR ROW —
  * it replaces `Window.orderBy(...)` (Exchange SinglePartition) in
  * q106/q187/q195, and the driver oracle hashes every value, so any
  * divergence (bucket boundary handling, ntile size rule, offset
  * arithmetic) is a correctness bug, not a perf nuance. */
class RangeRankSpec extends SparkSpec {

  private def cust: DataFrame = spark.read
    .parquet(s"$sf0001/orders.parquet")
    .groupBy(col("o_custkey").as("k"))
    .agg(count(lit(1)).as("freq"),
      sum(round(col("o_totalprice") * 100).cast("long"))
        .cast("long").as("money"))

  private def rows(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq).sortBy(_.mkString("|"))

  test("global row_number equals the single-partition form (asc + desc)") {
    val base = cust
    for (desc <- Seq(false, true); buckets <- Seq(1, 4, 128)) {
      val ord = if (desc) col("money").desc else col("money").asc
      val want = base.withColumn("rn",
        row_number().over(Window.orderBy(ord, col("k").asc)).cast("long"))
      val got = RangeRank.withRowNumber(base, "money", "k", "rn",
        desc = desc, buckets = buckets)
      assert(rows(got, "k", "rn") == rows(want, "k", "rn"),
        s"desc=$desc buckets=$buckets")
    }
  }

  test("ntile matches the ANSI single-partition ntile for several n") {
    val base = cust
    for (n <- Seq(3, 5, 8); buckets <- Seq(1, 4, 128)) {
      val want = base.withColumn("b",
        ntile(n).over(Window.orderBy(col("freq"), col("k"))).cast("long"))
      val got = RangeRank.withNtile(base, "freq", "k", n, "b",
        buckets = buckets)
      assert(rows(got, "k", "b") == rows(want, "k", "b"),
        s"n=$n buckets=$buckets")
    }
  }

  test("ntile desc matches the ANSI single-partition desc ntile") {
    // the q142 decile shape: best-first order, doc_id tiebreak
    val base = cust
    for (n <- Seq(3, 10); buckets <- Seq(1, 128)) {
      val want = base.withColumn("b",
        ntile(n).over(Window.orderBy(col("money").desc, col("k")))
          .cast("long"))
      val got = RangeRank.withNtile(base, "money", "k", n, "b",
        desc = true, buckets = buckets)
      assert(rows(got, "k", "b") == rows(want, "k", "b"),
        s"n=$n buckets=$buckets")
    }
  }

  test("running sum (desc) matches the single-partition running sum") {
    val base = cust
    val want = base.withColumn("cum",
      sum("money").over(Window.orderBy(col("money").desc, col("k").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    val got = RangeRank.withRunningSum(base, "money", "k", "money", "cum",
      desc = true)
    assert(rows(got, "k", "cum") == rows(want, "k", "cum"))
  }

  test("chained ntiles with statsFrom equal three independent window ntiles") {
    val base = cust
    val s0 = RangeRank.withNtile(base, "freq", "k", 5, "f", statsFrom = base)
    val got = RangeRank.withNtile(s0, "money", "k", 5, "m", statsFrom = base)
    val want = base
      .withColumn("f",
        ntile(5).over(Window.orderBy(col("freq"), col("k"))).cast("long"))
      .withColumn("m",
        ntile(5).over(Window.orderBy(col("money"), col("k"))).cast("long"))
    assert(rows(got, "k", "f", "m") == rows(want, "k", "f", "m"))
  }

  test("withNtiles (fused side passes) equals per-column window ntiles") {
    val base = cust
    val got = RangeRank.withNtiles(base,
      Seq(("freq", "k", 5, "f"), ("money", "k", 3, "m"),
        ("money", "k", 5, "m5")), statsFrom = base)
    val want = base
      .withColumn("f",
        ntile(5).over(Window.orderBy(col("freq"), col("k"))).cast("long"))
      .withColumn("m",
        ntile(3).over(Window.orderBy(col("money"), col("k"))).cast("long"))
      .withColumn("m5",
        ntile(5).over(Window.orderBy(col("money"), col("k"))).cast("long"))
    assert(rows(got, "k", "f", "m", "m5") ==
      rows(want, "k", "f", "m", "m5"))
  }

  test("degenerate domain (all values equal) still ranks by tiebreak") {
    import spark.implicits._
    val base = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L))
      .toDF("k", "v")
    val got = RangeRank.withNtile(base, "v", "k", 3, "b")
    val want = base.withColumn("b",
      ntile(3).over(Window.orderBy(col("v"), col("k"))).cast("long"))
    assert(rows(got, "k", "b") == rows(want, "k", "b"))
  }

  test("empty frame yields an empty ranked frame") {
    import spark.implicits._
    val base = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(RangeRank.withNtile(base, "v", "k", 5, "b").count() == 0L)
    assert(RangeRank.withRunningSum(base, "v", "k", "v", "c").count() == 0L)
  }

  test("strict-prefix running max equals the single-partition form") {
    // the q99 skyline dominance prefix: null on the global first row,
    // exact longs everywhere else, for degenerate and realistic bucket
    // counts
    val base = cust
    val want = base.withColumn("sm",
      max("money").over(Window.orderBy(col("freq").asc, col("k").asc)
        .rowsBetween(Window.unboundedPreceding, -1)).cast("long"))
    for (buckets <- Seq(1, 4, 128)) {
      val got = RangeRank.withRunningMax(base, "freq", "k", "money", "sm",
        buckets = buckets)
      assert(rows(got, "k", "sm") == rows(want, "k", "sm"),
        s"buckets=$buckets")
    }
  }

  test("NULL or NaN order values refuse loudly instead of dropping rows") {
    // ADVICE r12: a null order value buckets to null and the offsets
    // join would silently DROP the row (Window.orderBy keeps it, nulls
    // first); a NaN double is order-blind in the bucket search. These
    // are shared generic utilities, so the precondition is enforced,
    // not just documented.
    import spark.implicits._
    val withNull = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("k", "v")
    val eNull = intercept[IllegalArgumentException] {
      RangeRank.withRowNumber(withNull, "v", "k", "rn").collect()
    }
    assert(eNull.getMessage.contains("NULL or NaN"))
    val withNaN = Seq((1L, 1.0), (2L, Double.NaN), (3L, 3.0))
      .toDF("k", "v")
    val eNaN = intercept[IllegalArgumentException] {
      RangeRank.withNtile(withNaN, "v", "k", 2, "b").collect()
    }
    assert(eNaN.getMessage.contains("NULL or NaN"))
    val eFused = intercept[IllegalArgumentException] {
      RangeRank.withNtiles(withNull, Seq(("v", "k", 2, "b"))).collect()
    }
    assert(eFused.getMessage.contains("NULL or NaN"))
  }

  test("the rank plan carries no Exchange SinglePartition") {
    val got = RangeRank.withNtile(cust, "money", "k", 5, "b")
    val p = got.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange SinglePartition"), p)
  }
}
