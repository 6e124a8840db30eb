package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** LazyStage semantics (q65's staging mechanism) + the checkpoint hygiene
  * contract of the clustering stage it defers. */
class LazyStageSpec extends SparkSpec {
  import spark.implicits._

  private val idSchema = StructType(Seq(StructField("id", LongType)))

  test("the thunk does not run at build, runs on first action, and runs exactly once") {
    var runs = 0
    val df = LazyStage.defer(spark, idSchema) { () =>
      runs += 1
      spark.range(10).select(col("id"))
    }
    assert(runs == 0, "thunk ran at DataFrame-build time")
    assert(df.count() == 10)
    assert(runs == 1)
    assert(df.agg(sum("id")).as[Long].head() == 45L)
    assert(runs == 1, "thunk re-ran on a second action over the same frame")
  }

  test("deferred frames carry the declared schema before materialization") {
    val df = LazyStage.defer(spark, idSchema) { () => spark.range(3).toDF("id") }
    // schema inspection must not trigger the stage
    assert(df.schema == idSchema)
  }

  test("q65 materialization leaves at most one checkpoint table alive (no block leak)") {
    // Round 3 leaked the initial + final-round label checkpoints on every
    // execution. Now every intermediate round is freed via its OWN
    // checkpoint RDD; only the final label table (backing the result) may
    // remain. Serialize vs other suites touching the shared session.
    val sc = spark.sparkContext
    val q = graft.SparkEntry.queries("q65_dedup_clusters")(spark, sf0001)
    val before = sc.getPersistentRDDs.keySet.size
    val n = q.count() // materializes the deferred clustering stage
    assert(n > 0)
    val after = sc.getPersistentRDDs.keySet.size
    assert(after - before <= 1,
      s"q65 left ${after - before} persistent RDDs behind (want <= 1: the final labels)")
  }

  test("q65 defers the propagation loop: building the frame schedules no Spark jobs") {
    val sc = spark.sparkContext
    val tracker = sc.statusTracker
    // compare MAX job id, not the id-list length: the status tracker
    // retains only spark.ui.retainedJobs entries, so in a long test
    // session the list SHRINKS as old jobs evict — length deltas went
    // negative and flaked this test at the 754-test scale (r11 close).
    // Max id is monotone under eviction.
    def maxJob(): Int =
      tracker.getJobIdsForGroup(null).maxOption.getOrElse(-1)
    val before = maxJob()
    val df = graft.SparkEntry.queries("q65_dedup_clusters")(spark, sf0001)
    val mid = maxJob()
    assert(mid == before,
      s"catalog construction of q65 ran Spark jobs ($before -> $mid) — the loop is eager again")
    assert(df.count() > 0)
    assert(maxJob() > mid, "materialization ran the staged jobs")
  }
}
