package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Source/sink format coverage beyond the pipeline's native CSV/gzip-JSON:
  * the DeviceData frame round-trips through parquet, ORC and JSON with
  * the multiset preserved (nested array-of-struct included). */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  private def device = Transform.toDeviceData(
    (1 to 50).map(i => CpuStats(s"dev-$i", 1000L + i, "0", s"$i", "3", "1", "0.5", "0")).toDF())

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.selectExpr("concat(name, '|', timestamp, '|', to_json(indicators)) AS k")
      .as[String].collect().sorted.toSeq

  private def withTempDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-fmt").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("parquet round-trip preserves the nested frame") {
    withTempDir { dir =>
      device.write.mode("overwrite").parquet(dir)
      assert(canon(spark.read.parquet(dir)) == canon(device))
    }
  }

  test("ORC round-trip preserves the nested frame") {
    withTempDir { dir =>
      device.write.mode("overwrite").orc(dir)
      assert(canon(spark.read.orc(dir)) == canon(device))
    }
  }

  test("gzip JSON round-trip preserves the nested frame (spill wire format)") {
    withTempDir { dir =>
      device.write.mode("overwrite").option("compression", "gzip").json(dir)
      assert(canon(spark.read.schema(Model.deviceDataSchema).json(dir)) == canon(device))
    }
  }

  test("hive-partitioned write + partition pruning: filtered read scans only matching partitions") {
    withTempDir { dir =>
      // at 100 TB the fact table is date-partitioned and a time-bounded
      // query must touch only its partitions — prove the whole path:
      // partitioned write, PartitionFilters in the plan, pruned file count
      val orders = graft.Tables.orders(spark, sf0001)
        .withColumn("o_year", year(col("o_orderdate")))
      orders.write.mode("overwrite").partitionBy("o_year").parquet(dir)

      val read = spark.read.parquet(dir).where(col("o_year") === 1995)
      read.collect()
      val plan = read.queryExecution.executedPlan.toString()
      assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
        "partition filter did not reach the scan:\n" + plan)

      // pruning is real: only the o_year=1995 directory is read
      val scanned = read.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(scanned.nonEmpty && scanned.forall(_.contains("o_year=1995")), scanned.mkString("\n"))

      // and values survive the partitioned round-trip
      val expected = orders.where(col("o_year") === 1995).count()
      assert(spark.read.parquet(dir).where(col("o_year") === 1995).count() == expected)
    }
  }
}
