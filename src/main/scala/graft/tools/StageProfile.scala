package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Dev-only variance localizer: runs each named catalog query `iters`
  * times in one session and prints, per iteration, wall seconds next to
  * the task-metric decomposition summed over every task the iteration
  * ran — executor run/CPU, JVM GC, shuffle fetch wait, shuffle write,
  * spill bytes. The column that grows with wall on a slow iteration
  * names the bottleneck class (guide §7.1's event-timeline triage,
  * scriptable): run≈cpu says compute, gc says heap pressure, fetch
  * says shuffle service, none-of-the-above says scheduler/driver.
  *
  * Usage: runMain graft.tools.StageProfile qNN_name [qMM_name ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default
  * 32), SPARK_GRAFT_ITERS (default 5).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "5").toInt
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-stageprofile"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val run = new AtomicLong; val cpu = new AtomicLong
    val gc = new AtomicLong; val fetch = new AtomicLong
    val swrite = new AtomicLong; val spillB = new AtomicLong
    val tasks = new AtomicLong; val deser = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          run.addAndGet(m.executorRunTime)
          cpu.addAndGet(m.executorCpuTime / 1000000)
          gc.addAndGet(m.jvmGCTime)
          fetch.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          swrite.addAndGet(m.shuffleWriteMetrics.writeTime / 1000000)
          spillB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          deser.addAndGet(m.executorDeserializeTime)
          tasks.incrementAndGet()
        }
        ()
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).selectExpr("sum(xxhash64(struct(*)))").collect() // JIT
      println(s"=== $name (cpus=$cpus, $sfDir)")
      (1 to iters).foreach { i =>
        Seq(run, cpu, gc, fetch, swrite, spillB, tasks, deser).foreach(_.set(0))
        val t0 = System.nanoTime()
        fn(spark, sfDir).selectExpr("sum(xxhash64(struct(*)))").collect()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain the async listener bus
        println(f"iter $i%2d wall=$wall%7.2f s  tasks=${tasks.get}%5d  " +
          f"run=${run.get / 1000.0}%8.1f  cpu=${cpu.get / 1000.0}%8.1f  " +
          f"gc=${gc.get / 1000.0}%6.1f  fetch=${fetch.get / 1000.0}%6.1f  " +
          f"deser=${deser.get / 1000.0}%6.1f  swrite=${swrite.get / 1000.0}%6.1f  " +
          f"spillMB=${spillB.get / 1e6}%8.1f")
      }
    }
    spark.stop()
  }
}
