package graft.tools

import graft.{Sessions, SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev-only build-cost profiler (round-10 verdict item 4): times
  * DataFrame CONSTRUCTION alone — no action — for the named catalog
  * queries, three repetitions each, plus a raw `spark.read.parquet`
  * baseline per table so footer/listing cost is separable from
  * Catalyst analysis cost. Usage:
  *   sbt "runMain graft.tools.BuildProfile q88_referential_integrity ..."
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.configure(
      SparkSession.builder().master("local[8]").appName("graft-buildprofile"), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // table-read baseline: first + repeat cost of schema'd parquet load
    val reads = Tables.names.map { t =>
      val first = time(Tables(spark, sfDir, t))
      val rep = (1 to 3).map(_ => time(Tables(spark, sfDir, t))).min
      f"$t%s=${first}%.3f/${rep}%.3f"
    }
    println("read first/repeat: " + reads.mkString(" "))
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to 3).map(_ => time(fn(spark, sfDir)))
      println(f"$name%-28s builds: " + ts.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
