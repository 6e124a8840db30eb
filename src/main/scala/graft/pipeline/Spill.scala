package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID
import java.util.zip.GZIPOutputStream

/** Dead-letter spill + replay protocol (reference O15-O18,
  * /root/reference/etl/main.go:311-394).
  *
  * Spill files are gzip streams holding one JSON array of DeviceData wire
  * rows, named `buffer_failed_worker<pid>_<uuid>.json.gz` — same format
  * and name shape as the reference (main.go:271,378-394), with a uuid so
  * concurrent workers never collide.
  *
  * Divergence from the reference, on purpose (SURVEY.md §2.2): the
  * reference deletes a spill file right after re-*enqueueing* its records
  * (main.go:329-337), leaving a crash window that loses the batch. Here
  * replay deletes a file only after the whole replay frame was
  * successfully re-*delivered* — at-least-once with no loss window
  * (duplicates on partial redelivery remain possible; exactly-once is the
  * streaming upgrade in graft.streaming).
  *
  * On a cluster the spill dir would be shared storage (HDFS/S3); the
  * format is plain gzip JSON precisely so `spark.read.json` replays it
  * with no custom reader.
  */
object Spill {

  def writeBatch(spillDir: String, workerId: Int, jsonRows: Seq[String]): File = {
    Files.createDirectories(Paths.get(spillDir))
    val tmp = new File(spillDir, s".tmp_${UUID.randomUUID()}")
    val out = new GZIPOutputStream(Files.newOutputStream(tmp.toPath))
    try out.write(jsonRows.mkString("[", ",", "]").getBytes("UTF-8"))
    finally out.close()
    // atomic publish so replay never sees a half-written file
    val dest = new File(spillDir, s"buffer_failed_worker${workerId}_${UUID.randomUUID()}.json.gz")
    Files.move(tmp.toPath, dest.toPath, StandardCopyOption.ATOMIC_MOVE)
    dest
  }

  def listSpillFiles(spillDir: String): Seq[File] = {
    val d = new File(spillDir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles((_, n) => n.startsWith("buffer_failed_worker") && n.endsWith(".json.gz")).toSeq
  }

  /** Read all spill files back as a DeviceData frame. gzip is transparent
    * to Spark's JSON source; multiLine handles the array-per-file shape.
    * The original worker id is recovered from the filename (reference O18,
    * main.go:361-372 — malformed names route to 0 there; here they cannot
    * occur but the same regexp+coalesce guard applies). */
  def readSpilled(spark: SparkSession, spillDir: String): DataFrame = {
    val files = listSpillFiles(spillDir)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Model.deviceDataSchema)
        .withColumn("worker_id", lit(0))
    else
      spark.read
        .schema(Model.deviceDataSchema)
        .option("multiLine", "true")
        .json(files.map(_.getPath): _*)
        .withColumn("worker_id",
          coalesce(
            nullif(regexp_extract(input_file_name(), "worker(\\d+)", 1), lit("")).cast("int"),
            lit(0)))
  }

  /** Replay: re-deliver everything in the spill dir through the sink in
    * no-spill mode — failed batches are NOT re-written (the original
    * files remain the single durable copy, so a sink that stays down
    * cannot duplicate spill contents across replays). Files are deleted
    * only after a fully-clean replay; a partial replay keeps them all,
    * which can re-deliver already-sent records next time (at-least-once,
    * documented). Returns (replayedRecords, deletedFiles). */
  def replay(spark: SparkSession, cfg: HttpSink.Config): (Long, Int) = {
    val files = listSpillFiles(cfg.spillDir)
    if (files.isEmpty) return (0L, 0)
    val frame = readSpilled(spark, cfg.spillDir).drop("worker_id")
    val json = Transform.deviceDataJson(frame)
    val stats = HttpSink.write(json, cfg, spillOnFailure = false)
    if (stats.spilledBatches == 0) {
      files.foreach(f => Files.deleteIfExists(f.toPath))
      (stats.sentRecords, files.size)
    } else (stats.sentRecords, 0)
  }
}
