package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Remaining SURVEY.md §5.2-3 properties: unpivot/pivot round-trip and
  * routing totality/balance. */
class PipelinePropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("unpivot (to indicators) then pivot back recovers the metric columns") {
    val gen = for {
      idle <- Gen.chooseNum(0, 100)
      user <- Gen.chooseNum(0, 100)
      sys <- Gen.chooseNum(0, 100)
      irq <- Gen.chooseNum(0, 100)
      nice <- Gen.chooseNum(0, 100)
    } yield (idle.toString, user.toString, sys.toString, irq.toString, nice.toString)
    val rows = Iterator.continually(gen.sample).flatten.take(50).toSeq.zipWithIndex
      .map { case ((i, u, sy, ir, ni), id) =>
        CpuStats(s"dev-$id", 1L, "0", i, u, sy, ir, ni) }
    val device = Transform.toDeviceData(rows.toDF())
    // pivot the nested long form back to wide
    val back = device
      .select(col("name"), explode(col("indicators")).as("ind"))
      .groupBy("name").pivot("ind.name").agg(first("ind.value"))
    val joined = rows.toDF().join(back, Seq("name"))
    val bad = joined.where(
      abs(lit(100.0) - col("pIdle").cast("double") - col("utilization")) > 1e-9 ||
        abs(col("pUser").cast("double") - col("user")) > 1e-9 ||
        abs(col("pSys").cast("double") - col("system")) > 1e-9 ||
        abs(col("pIRQ").cast("double") - col("irq")) > 1e-9 ||
        abs(col("pNice").cast("double") - col("nice")) > 1e-9)
    assert(joined.count() == 50 && bad.count() == 0)
  }

  test("round-robin routing is total and balanced") {
    val n = 10000
    val parts = 10
    val routed = spark.range(0, n).repartition(parts)
      .select(spark_partition_id().as("pid"))
      .groupBy("pid").count().as[(Int, Long)].collect().toMap
    assert(routed.values.sum == n) // total: nothing lost
    assert(routed.size == parts)
    val (mn, mx) = (routed.values.min, routed.values.max)
    assert(mx - mn <= n / parts / 2, s"imbalanced: min=$mn max=$mx")
  }

  test("keyed routing is total and deterministic across runs") {
    val df = spark.range(0, 5000).select((col("id") % 97).as("k"), col("id"))
    def route() = df.repartition(8, col("k"))
      .select(col("k"), spark_partition_id().as("pid"))
      .distinct().as[(Long, Int)].collect().toMap
    val a = route()
    val b = route()
    assert(a == b)
    assert(a.keySet.size == 97)
  }
}
