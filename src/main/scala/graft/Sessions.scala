package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Settings chosen for 100 TB posture and oracle parity:
  *   - AQE on (runtime coalescing, skew-join splitting, dynamic broadcast);
  *   - shuffle partitions sized to the machine in local mode (a cluster
  *     deploy would size to ~2-3x total cores; AQE coalesces down);
  *   - ANSI off: the engine follows classic Spark/DuckDB-compatible
  *     non-strict semantics (cast failure -> NULL, x/0 -> NULL), which is
  *     also what the reference's lenient parsing maps to
  *     (/root/reference/etl/main.go:214-218 discards parse errors);
  *   - UTC session timezone so timestamp results are engine-independent.
  */
object Sessions {
  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores)
      // testdata events.parquet carries TIMESTAMP(NANOS) which Spark has no
      // native type for: read as nanos-long, normalized to TimestampType
      // (micros, truncated like DuckDB does) in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(appName: String, cores: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      cores.toString).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
