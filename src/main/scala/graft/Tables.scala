package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided testdata
  * (`/root/testdata/sf*`; see TESTDATA.md). Every query receives the
  * scale-factor directory at call time so the same code runs at any SF —
  * and, on a real cluster, against any warehouse path. Reads are plain
  * `spark.read.parquet`, so Catalyst owns column pruning and filter
  * pushdown into the scan (verified via `.explain("formatted")` — see
  * PlanChecks in the test suite).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in the source parquet. With
    * `spark.sql.legacy.parquet.nanosAsLong` it scans as nanos-since-epoch
    * LongType; normalize to TimestampType by integer division (`div`, not
    * float `/`: nano epochs ~1.7e18 exceed double's 2^53 exact range),
    * truncating toward zero exactly as DuckDB's nanos->micros read does.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Regenerated testdata writes TIMESTAMP(MICROS, isAdjustedToUTC=
        // false) -> Spark scans TIMESTAMP_NTZ. The session timezone is
        // pinned to UTC, so casting NTZ -> TIMESTAMP reinterprets the
        // same wall-clock as the same instant DuckDB's naive read sees.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
