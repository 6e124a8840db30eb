package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal decode / feature-extract plumbing: media as opaque BINARY
  * columns flowing through `mapPartitions` in batches, with typed
  * metadata structs alongside.
  *
  * The decode step itself is a STUB — this container ships no image/
  * audio/video codecs — implemented as a deterministic fake that derives
  * "decoded" properties from the bytes (stable across runs, so the
  * pipeline around it is fully testable). Swapping `FakeCodec` for a real
  * JNI/codec binding changes nothing about the Spark plumbing: schema,
  * batch shape, partitioning and memory profile stay as verified here.
  *
  * Scale posture: one codec instance per partition (never per row),
  * rows streamed — nothing buffers a whole partition; repartition by a
  * size-balanced key upstream when media sizes are skewed.
  */
object BinaryDecode {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class DecodedRow(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      // fixed-length feature vector a downstream embedding model would consume
      features: Array[Float])

  /** Deterministic fake codec: ??? in spirit — the real decode would go
    * here. Derives stable pseudo-properties from content bytes. */
  object FakeCodec {
    def decode(kind: String, content: Array[Byte]): DecodedRow0 = {
      var h = 1125899906842597L // deterministic FNV-ish roll over bytes
      var i = 0
      while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
      val w = 64 + math.floorMod(h, 512).toInt
      val ht = 64 + math.floorMod(h >> 9, 512).toInt
      val frames = if (kind == "video") 1 + math.floorMod(h >> 18, 30).toInt else 1
      val feats = Array.tabulate(8)(j => math.floorMod(h >> (j * 7), 1000).toFloat / 1000f)
      DecodedRow0(w, ht, frames, feats)
    }
  }
  final case class DecodedRow0(width: Int, height: Int, nFrames: Int, features: Array[Float])

  /** Batch decode: one codec per partition, streaming rows through it. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would be opened once per partition here
      rows.map { r =>
        val d = FakeCodec.decode(r.kind, r.content)
        DecodedRow(r.media_id, r.kind, r.content.length.toLong,
          d.width, d.height, d.nFrames, d.features)
      }
    }
  }

  /** Frame-sampling shape over decoded video rows: one row per sampled
    * frame index (every `stride`-th frame) — pure Catalyst, no UDF. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .where(col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize shape over decoded rows: aspect-preserving fit into a
    * `maxDim` bounding box (the thumbnail/model-input normalization pass
    * of a multimodal pipeline). The geometry — integer scaling with
    * floor semantics, minimum 1px — is the real contract a codec-backed
    * resize would honor; only pixel resampling itself would live in the
    * per-partition codec (FakeCodec stands in, same as decode). Pure
    * codegen'd arithmetic, zero shuffles. */
  def resizeFit(decoded: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim >= 1, s"resizeFit: maxDim=$maxDim")
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    // longest >= 1 so a degenerate 0x0 probe cannot null the division;
    // the OUTER clamp keeps the >=1px contract even then (an inner-only
    // clamp would let least(w=0, 1) emit 0)
    val longest = greatest(w, h, lit(1L))
    // floor((side * maxDim) / longest); the int products are tiny enough
    // that the double division is exact-to-truncation. Only downscale
    // (never inflate below-bound media), clamp to >= 1px
    val sw = greatest(lit(1L), least(w, (w * maxDim / longest).cast("long")))
    val sh = greatest(lit(1L), least(h, (h * maxDim / longest).cast("long")))
    decoded.select(
      col("media_id"), col("kind"), col("width"), col("height"),
      sw.cast("int").as("out_width"),
      sh.cast("int").as("out_height"))
  }

  final case class EmbeddedRow(
      media_id: Long,
      // batch identity is part of the OUTPUT so the batching contract is
      // verifiable end to end (and auditable in production runs)
      batch_id: Long,
      batch_size: Int,
      embedding: Array[Float])

  /** Deterministic fake batch encoder: one "model forward" per batch of
    * byte payloads — the real embedding model would go here. Stateless
    * and content-deterministic so the plumbing is testable. */
  object FakeEncoder {
    def encodeBatch(contents: Seq[Array[Byte]]): Seq[Array[Float]] =
      contents.map { c =>
        var h = 1125899906842597L
        var i = 0
        while (i < c.length) { h = 31 * h + (c(i) & 0xff); i += 1 }
        Array.tabulate(8)(j => math.floorMod(h >> (j * 7), 1000).toFloat / 1000f)
      }
  }

  /** Batched embedding inference over a media column — the standard
    * GPU-inference pipeline shape: the model is "loaded" once per
    * partition, rows stream through in fixed-size batches (one model
    * forward per batch, memory bounded at O(batchSize)), the tail batch
    * of each partition may be short. A Pandas-UDF `mapInPandas` would be
    * the PySpark twin of this exact shape; here the batching lives in
    * the JVM iterator. */
  def encodeBatched(media: Dataset[MediaRow], batchSize: Int): Dataset[EmbeddedRow] = {
    import media.sparkSession.implicits._
    require(batchSize >= 1, "encodeBatched: batchSize must be >= 1")
    media.mapPartitions { rows =>
      val pid = Option(org.apache.spark.TaskContext.get()).map(_.partitionId()).getOrElse(0)
      // real model init (load weights, pin device memory) happens HERE,
      // once per partition — never per row, never per batch
      var batchIdx = -1L
      rows.grouped(batchSize).flatMap { batch =>
        batchIdx += 1
        val embs = FakeEncoder.encodeBatch(batch.map(_.content)) // one forward
        batch.lazyZip(embs).map { (r, e) =>
          EmbeddedRow(r.media_id, (pid.toLong << 32) | batchIdx, batch.size, e)
        }
      }
    }
  }
}
