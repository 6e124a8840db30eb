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

  /** The one spill-file read recipe (schema + multiLine gzip JSON) —
    * readSpilled and replay both go through here so the format cannot
    * drift between them.
    *
    * LOAD-BEARING FORMAT ASSUMPTION: replay's idempotency key
    * `<file>#<batchIdx>@<batchSize>` is stable across replay rounds ONLY
    * because multiLine JSON files are unsplittable — each file is read
    * whole, in one task, with stable intra-file row order, so batch index
    * i always covers the same row extent. Switching this recipe to a
    * splittable format (e.g. line-delimited JSON) would alias keys over
    * different extents and a keyed sink would silently drop undelivered
    * tail rows. SpillRoundtripSpec's "each spill file occupies exactly one
    * partition" test breaks loudly if this recipe ever changes.
    * (package-visible so that test exercises the real recipe) */
  private[pipeline] def readRaw(spark: SparkSession, files: Seq[File]): DataFrame =
    spark.read
      .schema(Model.deviceDataSchema)
      .option("multiLine", "true")
      .json(files.map(_.getPath): _*)

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
      readRaw(spark, files)
        .withColumn("worker_id",
          coalesce(
            nullif(regexp_extract(input_file_name(), "worker(\\d+)", 1), lit("")).cast("int"),
            lit(0)))
  }

  /** Replay with PER-FILE delivery granularity: each spill file's rows are
    * posted as their own batches and the file is deleted as soon as ITS
    * rows are fully delivered — one still-failing file no longer pins
    * every already-delivered file into the next replay round.
    *
    * Within-file partials are covered by the idempotency key: replay
    * batches are keyed `<spillFile>#<batchIndex>`, stable across replay
    * rounds (same file, same batching), so a keyed sink drops the second
    * copy of the already-delivered half of a partially-replayed file.
    * Failed batches are NOT re-spilled (the original files remain the
    * single durable copy). One distributed job regardless of file count —
    * multiLine JSON reads each gzip file whole in one task, so a file's
    * rows are always consecutive within a partition. Returns
    * (replayedRecords, deletedFiles). */
  def replay(spark: SparkSession, cfg: HttpSink.Config): (Long, Int) = {
    val files = listSpillFiles(cfg.spillDir)
    if (files.isEmpty) return (0L, 0)
    val json = Transform.deviceDataJson(readRaw(spark, files))
      .withColumn("__src", input_file_name())
    val sentR = spark.sparkContext.longAccumulator("replay.sentRecords")
    val okFiles = spark.sparkContext.collectionAccumulator[String]("replay.okFiles")
    json.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val fileOk = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var cur: String = null
      var batchIdx = 0
      def flush(): Unit = if (buf.nonEmpty) {
        // batchSize is part of the key: under a different batch size the
        // same index covers a DIFFERENT row extent, and a keyed sink
        // deduping old-extent keys would silently drop the tail rows —
        // re-delivery (at-least-once) is the correct failure mode there.
        val key = s"${cur.substring(cur.lastIndexOf('/') + 1)}#$batchIdx@${cfg.batchSize}"
        val ok = HttpSink.postBatchWithRetry(cfg, buf.toSeq, Some(key)).isRight
        if (ok) sentR.add(buf.size)
        else System.err.println(
          s"[replay] batch of ${buf.size} from $cur failed; file kept for next replay")
        fileOk.update(cur, fileOk.getOrElse(cur, true) && ok)
        batchIdx += 1
        buf.clear()
      }
      rows.foreach { r =>
        val f = r.getString(1)
        if (f != cur) { flush(); cur = f; batchIdx = 0; fileOk.getOrElseUpdate(f, true) }
        buf += r.getString(0)
        if (buf.size >= cfg.batchSize) flush()
      }
      flush()
      fileOk.foreach { case (f, ok) => if (ok) okFiles.add(f) }
    }
    // file paths come back as URIs; match on the (uuid-unique) basename
    val okNames = {
      import scala.jdk.CollectionConverters._
      okFiles.value.asScala.map(u => u.substring(u.lastIndexOf('/') + 1)).toSet
    }
    val deleted = files.count(f => okNames(f.getName) && Files.deleteIfExists(f.toPath))
    (sentR.value, deleted)
  }
}
