package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: restrict the dump to these query names
    // (dev iteration; the driver always calls with exactly two args)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-verify"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // q66's oracle parity rests on a measured corpus property (no doc
    // pair with exact Jaccard in [0.1, 0.8) => LSH recall exactly 1.0).
    // Probe it HERE so a future corpus/SF change surfaces as this
    // actionable message, not as a bare q66 hash mismatch downstream.
    try {
      val gap = graft.operators.DedupQueries
        .recallPremiseGapPairs(Tables.documents(spark, sfDir)).count()
      if (gap > 0) System.err.println(
        s"[verify] WARNING: q66 LSH-recall premise violated at $sfDir: " +
        s"$gap doc pairs with exact shingle Jaccard in [0.1, 0.8). The " +
        "8x2 banding can miss pairs in that band, so q66's sketch-built " +
        "edge set — and q35's confirmed-pair set, whose r12 oracle " +
        "rests on the same premise — may legitimately diverge from " +
        "the exact-pair oracle: a q66/q35 hash mismatch in this run " +
        "is the corpus changing, not an engine bug (see " +
        "DedupQueries.recallPremiseGapPairs).")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] q66 premise probe failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
