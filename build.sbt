ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "concurrentetlgospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output passes through VERBATIM instead of via the sbt logger:
// the driver machine-reads Bench's one-line JSON summary, and the logger's
// "[info] " prefix has broken that parse three rounds running. (Full-name
// per-query detail is mirrored to target/bench_summary.json — NOT to
// stderr: a stderr copy after the stdout summary clipped the driver's
// merged-capture tail in round 9.)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Size the single-JVM heap to the ACTUAL machine, not to one box:
// local[32] runs 32 concurrent tasks in ONE heap, and a 150-query
// session accumulates legitimate long-lived blocks (clustering
// checkpoints, shared family projections, ANN indexes). At 8g the
// catalog tail ran under visible GC pressure — q95's full-catalog
// driver shot measured ~2x its isolated steady state (rounds 7-8).
// Default: MemTotal/4, floored at 4 GiB (Spark won't start useful
// local[32] work below that) and capped at 28 GiB (measured sweet
// spot on the 128 GiB CI box; beyond it GC pauses grow with no
// speedup). SPARK_DRIVER_MEM always wins.
val driverHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val memTotalGiB: Long =
    try {
      import scala.jdk.CollectionConverters._
      val kb = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get("/proc/meminfo")).asScala
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.split("\\s+")(1).toLong }
        .getOrElse(0L)
      kb / (1024L * 1024L)
    } catch { case _: Throwable => 0L } // non-Linux: fall to the floor
  s"${math.min(28L, math.max(4L, memTotalGiB / 4))}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap",
)
