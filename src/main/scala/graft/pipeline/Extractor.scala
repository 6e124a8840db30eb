package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extract stage (reference O3, /root/reference/etl/main.go:188-207):
  * per-appliance device lookup producing CpuStats.
  *
  * Two implementations behind one interface:
  *   - [[ProjectionExtractor]]: the idiomatic path. The reference's
  *     "extract" fabricates constants + a timestamp, which is a pure
  *     projection — zero per-row cost, stays inside whole-stage codegen.
  *   - [[SimulatedLatencyExtractor]]: reproduces the reference's 6 s
  *     blocking call via [[AsyncMap]] so the orchestration (bounded
  *     1,000-way fan-out) is actually exercised — this is also the shape
  *     a real HTTP fetcher plugs into (swap the sleep for a client call;
  *     one client per JVM, never per row).
  */
trait Extractor extends Serializable {
  def extract(spark: SparkSession, appliances: DataFrame): DataFrame
}

/** Constant-time extract as a pure projection (values mirror the
  * reference's fabricated CpuStats, main.go:195-205). `fixedTimestamp`
  * keeps results deterministic for tests/oracles; None = current time. */
final case class ProjectionExtractor(fixedTimestamp: Option[Long] = None) extends Extractor {
  override def extract(spark: SparkSession, appliances: DataFrame): DataFrame = {
    val ts = fixedTimestamp.map(lit).getOrElse(unix_timestamp())
    appliances.select(
      col("hostname").as("name"),
      ts.cast("long").as("timestamp"),
      lit("0").as("cpu_number"),
      lit("95").as("pIdle"),
      lit("3").as("pUser"),
      lit("1").as("pSys"),
      lit("0.5").as("pIRQ"),
      lit("0").as("pNice"))
  }
}

/** Latency-faithful extract: per-row blocking call of `latencyMillis`,
  * run `globalConcurrency`-wide across the cluster via AsyncMap. */
final case class SimulatedLatencyExtractor(
    latencyMillis: Long,
    globalConcurrency: Int,
    fixedTimestamp: Option[Long] = None) extends Extractor {

  override def extract(spark: SparkSession, appliances: DataFrame): DataFrame = {
    import spark.implicits._
    val lat = latencyMillis
    val fixed = fixedTimestamp
    val apps: Dataset[Appliance] =
      appliances.select(col("ip"), col("hostname")).as[Appliance]
    AsyncMap.mapConcurrentGlobal(apps, globalConcurrency) { ap =>
      Thread.sleep(lat) // stand-in for the device API round-trip
      CpuStats(
        name = ap.hostname,
        timestamp = fixed.getOrElse(System.currentTimeMillis() / 1000),
        cpu_number = "0",
        pIdle = "95", pUser = "3", pSys = "1", pIRQ = "0.5", pNice = "0")
    }.toDF()
  }
}
