package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Bucketed co-located joins: writing both fact tables bucketed on the
  * join key lets the join run with NO shuffle exchange on either side —
  * the technique that turns the q04 fact-fact join from "shuffle 100 TB
  * twice" into "zip matching buckets". Demonstrated against a temp
  * warehouse (the driver testdata is read-only).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val db = "graft_bucketing_demo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")
    try {
      graft.Tables.lineitem(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")
      graft.Tables.orders(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString()
      // the join itself must not shuffle either side: the ONLY exchange
      // allowed in the whole plan is the one feeding the final
      // aggregation (an unbucketed join would add two more)
      assert(plan.contains("SortMergeJoin"), plan)
      val nExchanges = "Exchange".r.findAllIn(plan).length
      assert(nExchanges <= 1, s"bucketed join still shuffles ($nExchanges exchanges):\n" + plan)

      // and it returns the same answer as the plain-parquet join
      val expected = graft.Tables.lineitem(spark, sf0001)
        .join(graft.Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }
  }
}
