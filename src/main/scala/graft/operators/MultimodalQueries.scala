package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque BINARY columns
  * with typed metadata extracted by deterministic expressions. The
  * container has no image/audio codecs, so "decode" is a clearly-marked
  * deterministic fake (see graft.multimodal.BinaryDecode for the
  * mapPartitions batch-decode plumbing); everything Spark-side — schema,
  * hashing, metadata arithmetic, partitioning — is real and verified.
  */
object MultimodalQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- q40
    "q40_multimodal_metadata" -> QueryDef.sql(
      "Binary payload metadata extraction: byte length, md5 checksum and " +
      "fake-decoded dimensions (pure arithmetic stand-in for a codec " +
      "probe) over text bytes as the stand-in media column.",
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  md5(text) AS checksum,
        |  (octet_length(encode(text)) % 512 + 64)::BIGINT AS width,
        |  ((octet_length(encode(text)) * 7) % 512 + 64)::BIGINT AS height,
        |  (n_chars % 30 + 1)::BIGINT AS frames
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val bin = col("text").cast("binary")
      val nb = length(bin).cast("long")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          nb.as("n_bytes"),
          md5(bin).as("checksum"),
          (nb % 512 + 64).as("width"),
          ((nb * 7) % 512 + 64).as("height"),
          (col("n_chars") % 30 + 1).as("frames"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q58
    "q58_multimodal_batch_embed" -> QueryDef.rowsOnly(
      "Batched embedding inference over a media BINARY column — the " +
      "GPU-inference pipeline shape: model init once per partition, " +
      "fixed-size 32-row batches streamed through one forward call each " +
      "(memory bounded at O(batch)), batch identity carried in the " +
      "output so the batching contract is auditable. Encoder is the " +
      "deterministic fake (no codecs in this container); the Spark " +
      "plumbing — mapPartitions, grouped iterator, schema — is real. " +
      "Engine-specific batch ids -> rows-only; batch-shape and " +
      "determinism properties in MultimodalSpec.") { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          lit("text").as("kind"),
          col("text").cast("binary").as("content"))
        .as[graft.multimodal.BinaryDecode.MediaRow]
      graft.multimodal.BinaryDecode.encodeBatched(media, batchSize = 32)
        .toDF()
        .select(col("media_id"), col("batch_size"),
          element_at(col("embedding"), 1).as("e0"),
          graft.functions.VectorFunctions.norm2(col("embedding")).as("e_norm"))
        .orderBy("media_id")
    }
  )
}
