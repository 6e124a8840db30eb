package graft.streaming

import graft.pipeline.{HttpSink, Transform}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import java.nio.file.{Files, Paths}

/** Structured Streaming upgrade of the batch ETL pipeline (SURVEY.md §7.4):
  * the reference's bespoke spill/replay protocol (at-least-once with a
  * loss window, /root/reference/etl/main.go:311-340) is replaced by
  * checkpointed micro-batches + an idempotent foreachBatch sink =
  * effectively-once delivery to the HTTP endpoint.
  *
  * Mechanics: Spark's checkpoint guarantees each micro-batch is replayed
  * until committed; the sink keeps its own tiny commit log (one marker
  * file per delivered batchId, on what would be shared storage in a
  * cluster). A replayed already-committed batch is skipped, so a crash
  * between delivery and checkpoint does not double-send. The streaming
  * path never writes dead-letter spill files (checkpoint retry is the
  * durability mechanism; a spill copy would be redelivered by the retry
  * anyway and then double-delivered by any later Spill.replay). Within a
  * batch, partial redelivery can still duplicate — full exactly-once
  * needs a transactional sink, which a plain HTTP POST endpoint cannot
  * offer.
  */
object StreamingEtl {

  /** Wrap a CpuStats-shaped streaming frame with the standard transform
    * and the idempotent batched HTTP sink. Caller starts the query. */
  def writer(
      cpuStream: DataFrame,
      sink: HttpSink.Config,
      commitLogDir: String,
      loadPartitions: Int = 10,
      lenient: Boolean = true,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] = {
    val device = Transform.toDeviceData(cpuStream, lenient)
    device.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deliverBatch(batch, batchId, sink, commitLogDir, loadPartitions)
      }
  }

  /** Idempotent per-micro-batch delivery. Visible for tests. */
  def deliverBatch(
      batch: DataFrame,
      batchId: Long,
      sink: HttpSink.Config,
      commitLogDir: String,
      loadPartitions: Int): Unit = {
    val marker = Paths.get(commitLogDir, s"batch-$batchId.committed")
    if (Files.exists(marker)) return // replay of an already-delivered batch
    val json = Transform.deviceDataJson(batch.repartition(loadPartitions))
    // spillOnFailure=false: in streaming the checkpoint retry IS the
    // durability mechanism. Spilling here would leave dead-letter copies
    // of records the retried micro-batch delivers anyway — a systematic
    // double-delivery path for any Spill.replay sharing this Config.
    val stats = HttpSink.write(json, sink, spillOnFailure = false)
    if (stats.spilledBatches > 0)
      throw new IllegalStateException(
        s"batch $batchId: ${stats.spilledBatches} groups undeliverable; failing the micro-batch for checkpoint retry")
    Files.createDirectories(marker.getParent)
    Files.write(marker, java.util.Arrays.asList(stats.sentRecords.toString))
  }

  /** Streaming twin of the batch pipeline's source+extract: watch a
    * directory for appliance CSV files (the reference's "run it again"
    * becomes file-arrival micro-batches), extract via projection, and
    * return the CpuStats-shaped stream ready for [[writer]]. */
  def csvSource(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      fixedTimestamp: Option[Long] = None,
      maxFilesPerTrigger: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = spark.readStream
      .schema("ip STRING, hostname STRING")
      .option("header", "false")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .csv(dir)
      .where(col("ip").isNotNull && col("hostname").isNotNull)
    graft.pipeline.ProjectionExtractor(fixedTimestamp).extract(spark, raw)
  }

  /** Convenience: start against a checkpoint dir and await termination of
    * an AvailableNow run (batch-like drain of everything pending). */
  def runAvailable(
      cpuStream: DataFrame,
      sink: HttpSink.Config,
      checkpointDir: String,
      loadPartitions: Int = 10): StreamingQuery = {
    val q = writer(cpuStream, sink, s"$checkpointDir/sink-commits", loadPartitions)
      .option("checkpointLocation", checkpointDir)
      .start()
    q.processAllAvailable()
    q
  }
}
