package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector: prints the AQE-finalized physical plan and
  * a scan/exchange census for the named catalog queries. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.configure(
      SparkSession.builder().master("local[8]").appName("graft-planprobe"), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString()
      def n(tok: String) = p.sliding(tok.length).count(_ == tok)
      println(s"=== $name scans=${n("FileScan")} reuse=${n("ReusedExchange")} " +
        s"exch=${n("Exchange")} smj=${n("SortMergeJoin")} bhj=${n("BroadcastHashJoin")}")
      println(p.take(12000))
    }
    spark.stop()
  }
}
