package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Brute-force anchors for the pricing-analytics rows: q194's per-brand
  * unit-value index and q195's ABC classes are recomputed in plain
  * Scala over the collected sf0.001 lineitem (6,005 rows) and compared
  * exactly. */
class PricingSpec extends SparkSpec {

  test("q194 price index: per-brand sums and index == brute force") {
    val part = spark.read.parquet(s"$sf0001/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_partkey"), year(col("l_shipdate")).as("y"),
        round(col("l_extendedprice") * 100).cast("long").as("e"),
        col("l_quantity").cast("long").as("q"))
      .where(col("y").isin(1995, 1996))
      .collect().map(r => (part(r.getLong(0)), r.getInt(1),
        r.getLong(2), r.getLong(3)))
    val sums = li.groupBy(r => (r._1, r._2)).view
      .mapValues(rs => (rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    val want = sums.keys.map(_._1).toSeq.distinct.sorted.flatMap { b =>
      for {
        (e0, q0) <- sums.get((b, 1995))
        (e1, q1) <- sums.get((b, 1996))
      } yield (b, e0, q0, e1, q1,
        (e1.toDouble / q1.toDouble) / (e0.toDouble / q0.toDouble))
    }
    val got = SparkEntry.queries("q194_price_index")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want, s"first divergence: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.nonEmpty && got.forall(_._6 > 0.0))
  }

  test("q195 ABC: classes == brute-force Pareto fold; shares partition") {
    val revs = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = revs.map(_._2).sum
    var cum = 0L
    val classed = revs.sortBy(r => (-r._2, r._1)).map { case (pk, rev) =>
      cum += rev
      val cls = if (20 * cum <= 16 * total) "A"
        else if (20 * cum <= 19 * total) "B" else "C"
      (cls, rev)
    }
    val want = classed.groupBy(_._1).map { case (c, rs) =>
      (c, rs.length.toLong, rs.map(_._2).sum,
        rs.map(_._2).sum.toDouble / total.toDouble)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q195_abc_classification")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want, s"got $got\nwant $want")
    assert(got.map(_._1) == Seq("A", "B", "C"), "all three classes populated")
    assert(got.map(_._3).sum == total, "classes partition total revenue")
  }

  test("q196 weighted median: election == brute-force weighted fold") {
    val sup = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select(col("s_suppkey").cast("long"),
        col("s_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat = spark.read.parquet(s"$sf0001/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_suppkey"), col("l_discount"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .collect().map(r => (nat(sup(r.getLong(0))), r.getDouble(1),
        r.getLong(2)))
    val want = li.groupBy(_._1).map { case (nation, rows) =>
      val byDisc = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val total = byDisc.map(_._2).sum
      var cum = 0L
      val (disc, crossing) = byDisc.iterator.map { case (d, w) =>
        cum += w; (d, cum) }.find { case (_, c) => 2 * c >= total }.get
      (nation, disc, crossing, total)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry
      .queries("q196_weighted_median_discount")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want, s"got $got want $want")
  }
}
