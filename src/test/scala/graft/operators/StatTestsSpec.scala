package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic anchors for the q182/q183/q184 two-sample testing family:
  * the KS and Mann-Whitney statistics are cross-checked against
  * independent BRUTE-FORCE computations folded in plain Scala over the
  * collected sf0.001 observations (1,500 orders — cheap to hold), so a
  * bug in the distributed prefix-sum scaffold cannot hide behind an
  * oracle that shares its shape. q184's cells are hand-computed on a
  * tiny frame (the q178 pattern) plus partition laws at sf0.001. */
class StatTestsSpec extends SparkSpec {

  /** (value cents, arm) observations collected once per suite. */
  private lazy val obs: Array[(Long, Long)] = {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        expr("((o_custkey % 2) + 2) % 2").cast("long").as("arm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(o.length == 1500)
    o
  }

  /** Brute-force per-value (c1, c0, f1, f0) fold, independent of the
    * engine's shard/window machinery. */
  private lazy val brute: Seq[(Long, Long, Long, Long, Long)] = {
    val byV = obs.groupBy(_._1).toSeq.sortBy(_._1)
    var (f1, f0) = (0L, 0L)
    byV.map { case (v, xs) =>
      val c1 = xs.count(_._2 == 1L).toLong
      val c0 = xs.size - c1
      f1 += c1; f0 += c0
      (v, c1, c0, f1, f0)
    }
  }

  test("armValueCum: prefix-sum ECDF == brute-force fold at sf0.001") {
    val got = ExtendedQueries.armValueCum(spark, sf0001)
      .orderBy("v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == brute, {
      val bad = got.zip(brute).find { case (a, b) => a != b }
      s"first divergence: $bad"
    })
  }

  test("q182 KS: statistic, argmin value, and verdict == brute force") {
    val n1 = brute.last._4; val n0 = brute.last._5
    val dnums = brute.map { case (v, _, _, f1, f0) =>
      (v, math.abs(f1 * n0 - f0 * n1)) }
    val dNum = dnums.map(_._2).max
    val atValue = dnums.filter(_._2 == dNum).map(_._1).min
    val r = SparkEntry.queries("q182_ks_two_sample")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n0") == n0)
    assert(r.getAs[Long]("d_num") == dNum, s"d_num ${r.getAs[Long]("d_num")} != $dNum")
    assert(r.getAs[Long]("at_value") == atValue)
    assert(r.getAs[Double]("d_stat") == dNum.toDouble / (n1 * n0).toDouble,
      "d_stat is the single-shape division")
    val crit = 1.358 * math.sqrt((n1 + n0).toDouble / (n1 * n0).toDouble)
    assert(r.getAs[Double]("crit_05") == crit)
    assert((r.getAs[Long]("reject_05") == 1L)
      == (r.getAs[Double]("d_stat") > crit), "verdict keys on the statistic")
  }

  test("q183 MWU: doubled U, tie term, and z == brute force; U1+U0 law") {
    val n1 = brute.last._4; val n0 = brute.last._5
    val u1x2 = brute.map { case (_, c1, c0, _, f0) =>
      c1 * (2L * (f0 - c0) + c0) }.sum
    val u0x2 = brute.map { case (_, c1, c0, f1, _) =>
      c0 * (2L * (f1 - c1) + c1) }.sum
    val tie = brute.map { case (_, c1, c0, _, _) =>
      val t = c1 + c0; t * (t * t - 1L) }.sum
    val r = SparkEntry.queries("q183_mann_whitney_u")(spark, sf0001)
      .collect() match { case Array(one) => one }
    assert(r.getAs[Long]("u1_x2") == u1x2 && r.getAs[Long]("u0_x2") == u0x2)
    assert(r.getAs[Long]("tie_term") == tie)
    assert(u1x2 + u0x2 == 2L * n1 * n0, "rank-sum partition identity")
    val n = n1 + n0
    val z = ((u1x2 - n1 * n0).toDouble / 2.0) /
      math.sqrt((n1.toDouble * n0.toDouble / 12.0)
        * ((n + 1).toDouble - tie.toDouble / (n.toDouble * (n - 1).toDouble)))
    assert(r.getAs[Double]("z_approx") == z, "z is the single-shape composite")
  }

  test("q184 DiD: exact hand cells on a tiny frame + catalog laws") {
    import spark.implicits._
    val customers = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"), // arms 1,0,1,0
      (5L, "B"), (6L, "B")) // no orders: zero-filled in both periods
      .toDF("c_custkey", "seg")
    def o(ck: Long, y: Int, p: Double) =
      (ck, java.sql.Timestamp.valueOf(s"$y-05-01 00:00:00"), p)
    val orders = Seq(
      o(1L, 1995, 10.0), o(1L, 1996, 30.0),
      o(2L, 1995, 20.0), o(2L, 1996, 20.0),
      o(3L, 1996, 60.0),
      o(4L, 1996, 40.0),
      o(1L, 1994, 999.0) // outside both periods: must not leak
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val per = customers
      .join(orders.withColumnRenamed("o_custkey", "c_custkey"),
        Seq("c_custkey"), "left")
      .groupBy(col("c_custkey"), col("seg"),
        expr("((c_custkey % 2) + 2) % 2").cast("long").as("arm"))
      .agg(
        coalesce(sum(when(year(col("o_orderdate")) === 1995,
          round(col("o_totalprice") * 100).cast("long"))), lit(0L))
          .cast("long").as("pre"),
        coalesce(sum(when(year(col("o_orderdate")) === 1996,
          round(col("o_totalprice") * 100).cast("long"))), lit(0L))
          .cast("long").as("post"))
    val did = (col("s1_post").cast("double") / col("n1").cast("double")
        - col("s1_pre").cast("double") / col("n1").cast("double")) -
      (col("s0_post").cast("double") / col("n0").cast("double")
        - col("s0_pre").cast("double") / col("n0").cast("double"))
    val got = per.rollup(col("seg"))
      .agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("n0"),
        sum(when(col("arm") === 1, col("pre")).otherwise(0L))
          .cast("long").as("s1_pre"),
        sum(when(col("arm") === 1, col("post")).otherwise(0L))
          .cast("long").as("s1_post"),
        sum(when(col("arm") === 0, col("pre")).otherwise(0L))
          .cast("long").as("s0_pre"),
        sum(when(col("arm") === 0, col("post")).otherwise(0L))
          .cast("long").as("s0_post"))
      .select(coalesce(col("seg"), lit("__all__")).as("segment"),
        col("n1"), col("n0"), col("s1_pre"), col("s1_post"),
        col("s0_pre"), col("s0_post"), did.as("did_cents"))
      .orderBy("segment")
      .as[(String, Long, Long, Long, Long, Long, Long, Double)]
      .collect().toList
    // A: arm1 = {1,3}: pre 1000, post 3000+6000; arm0 = {2,4}: pre
    // 2000, post 2000+4000. did = (4500-500) - (3000-1000) = 2000.
    // B: one zero-filled unit per arm. __all__ folds both.
    assert(got == List(
      ("A", 2L, 2L, 1000L, 9000L, 2000L, 6000L, 2000.0),
      ("B", 1L, 1L, 0L, 0L, 0L, 0L, 0.0),
      ("__all__", 3L, 3L, 1000L, 9000L, 2000L, 6000L,
        (9000.0 / 3.0 - 1000.0 / 3.0) - (6000.0 / 3.0 - 2000.0 / 3.0))),
      s"$got")
    // catalog laws at sf0.001
    val cat = SparkEntry.queries("q184_diff_in_diff")(spark, sf0001).collect()
    val (all, segs) = cat.partition(_.getString(0) == "__all__")
    assert(all.length == 1 && segs.length == 5)
    Seq("n1", "n0", "s1_pre", "s1_post", "s0_pre", "s0_post").foreach { c =>
      assert(all.head.getAs[Long](c) == segs.map(_.getAs[Long](c)).sum,
        s"__all__ is the segment fold for $c")
    }
    assert(all.head.getAs[Long]("n1") + all.head.getAs[Long]("n0") == 150L,
      "full assignment frame: every customer is a unit")
  }
}
