package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Steady-state per-query timing: the variance-bounds instrument behind
  * BASELINE.md's bench-methodology notes (the q15 JIT case in round 2,
  * the q30/q55 ambient-load case in round 3).
  *
  * Unlike Bench (one timed shot per query, driver-comparable), this runs
  * each query `iters` times in one session after a warmup pass and prints
  * min/median/max — min approximates the zero-contention cost of the
  * plan, median-vs-min spread approximates scheduler/ambient noise, and a
  * large max with a small min is load, not plan.
  *
  * Usage: runMain graft.tools.BenchSteady [q30_text_quality q55_... ]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  *      SPARK_GRAFT_ITERS (default 7).
  */
object BenchSteady {
  def main(args: Array[String]): Unit = {
    // f-interpolator formatting follows the JVM default locale; pin it
    // so a comma-decimal locale cannot emit unparseable JSON metrics
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "7").toInt
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q30_text_quality", "q55_corpus_clean", "q29_text_token_stats",
        "q01_pricing_summary")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench-steady"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup: same code path, compiles every codegen class once
      fn(spark, sfDir).selectExpr("sum(xxhash64(struct(*)))").collect()
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).selectExpr("sum(xxhash64(struct(*)))").collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // true median (even iteration counts average the two middle samples
      // — on a contended box adjacent samples differ by hundreds of ms)
      val med =
        if (times.length % 2 == 1) times(times.length / 2)
        else (times(times.length / 2 - 1) + times(times.length / 2)) / 2
      println(f"""{"query":"$name","min":${times.head}%.3f,"median":$med%.3f,"max":${times.last}%.3f,"iters":$iters,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
