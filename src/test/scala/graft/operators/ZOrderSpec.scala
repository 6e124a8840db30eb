package graft.operators

import graft.SparkSpec
import graft.functions.ZOrder
import org.apache.spark.sql.functions._

/** q73 z-order layout: the bit interleave is exactly invertible (so the
  * curve key loses no information within the 16-bit domain), the Column
  * and local implementations agree, and — the property the operator
  * exists for — files written in z order bound BOTH dimensions' per-file
  * spans at once, where a single-column sort leaves the other dimension's
  * span at essentially the full range. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def decode(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < ZOrder.bitsPerDim) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  test("zValueLocal is an exact invertible interleave on the 16-bit domain") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      assert(decode(ZOrder.zValueLocal(x, y)) == ((x, y)))
    }
    // wider inputs mask down to their low 16 bits, never overflow
    assert(ZOrder.zValueLocal(65536L + 3, 7) == ZOrder.zValueLocal(3, 7))
    assert(ZOrder.zValueLocal(65535, 65535) == 4294967295L)
  }

  test("the Column implementation matches zValueLocal row for row") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ZOrder.zValueLocal(x, y), s"mismatch at ($x, $y)")
    }
  }

  test("z-ordered files bound both dimensions; a date sort only bounds date") {
    val oday = datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01")))
    val raw = graft.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), oday.cast("long").as("oday"))
    val bounds = raw.agg(
      min("o_custkey").as("clo"), max("o_custkey").as("chi"),
      min("oday").as("dlo"), max("oday").as("dhi"))
    val base = raw.crossJoin(broadcast(bounds))
      .withColumn("zval", ZOrder.zValue(
        expr(ZOrder.scale16Sql("o_custkey", "clo", "chi", "div")),
        expr(ZOrder.scale16Sql("oday", "dlo", "dhi", "div"))))
      .select("o_custkey", "oday", "zval")
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      base.repartitionByRange(8, col("zval")).sortWithinPartitions("zval")
        .write.parquet(s"$tmp/bycurve")
      base.repartitionByRange(8, col("oday")).sortWithinPartitions("oday")
        .write.parquet(s"$tmp/bydate")

      // mean per-file span of each dimension, normalized by its global range
      def spans(dir: String): (Double, Double) = {
        val df = spark.read.parquet(dir)
          .groupBy(input_file_name())
          .agg((max("o_custkey") - min("o_custkey")).as("cs"),
            (max("oday") - min("oday")).as("ds"))
          .agg(avg("cs").as("mc"), avg("ds").as("md"))
          .as[(Double, Double)].head()
        val (custRange, dayRange) = base
          .agg((max("o_custkey") - min("o_custkey")).cast("double"),
            (max("oday") - min("oday")).cast("double"))
          .as[(Double, Double)].head()
        (df._1 / custRange, df._2 / dayRange)
      }
      val (zc, zd) = spans(s"$tmp/bycurve")
      val (lc, ld) = spans(s"$tmp/bydate")
      // The z curve must contract BOTH dims well below the full range...
      assert(zc < 0.7, s"z layout custkey span $zc not contracted")
      assert(zd < 0.7, s"z layout day span $zd not contracted")
      // ...while the single-column sort contracts only its own dim: the
      // non-sorted dimension stays at essentially the full range, which
      // is exactly the file-skipping gap z order closes.
      assert(ld < 0.5, s"date layout should bound date tightly, got $ld")
      assert(lc > 0.8, s"date layout unexpectedly bounded custkey: $lc")
      assert(zc < lc - 0.2,
        s"z layout ($zc) must beat the date sort ($lc) on the second dim")
    } finally {
      val d = new java.io.File(tmp)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(d)
    }
  }

  test("q73 buckets partition the orders table and nest inside the curve") {
    val out = graft.SparkEntry.queries("q73_zorder_layout")(spark, sf001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum ==
      graft.Tables.orders(spark, sf001).count(), "bucket counts must cover")
    assert(out.map(_._1).distinct.length == out.length, "buckets unique")
    // equi-width bucketing is monotone on z, and z's high bits come from
    // both dims, so consecutive buckets' rectangles may overlap — but
    // every bucket must be a genuine rectangle: lo <= hi on both dims
    out.foreach { case (b, _, cl, ch, dl, dh) =>
      assert(cl <= ch && dl <= dh, s"bucket $b degenerate rectangle")
    }
  }
}
