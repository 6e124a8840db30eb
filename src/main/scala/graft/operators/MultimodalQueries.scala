package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque BINARY columns
  * with typed metadata extracted by deterministic expressions.
  *
  * The decode layer (graft.multimodal.BinaryDecode) is pluggable: REAL
  * image decode + pixel resize exist on the JDK's javax.imageio
  * (BinaryDecodeSpec drives actual PNGs through it); audio/video remain
  * a clearly-marked deterministic fake (no JDK codec). THESE catalog
  * queries run over the SYNTHETIC corpus, whose binary column is text
  * bytes rather than encoded media, so they use the deterministic fake
  * path — everything Spark-side (schema, hashing, metadata arithmetic,
  * partitioning, batch shape) is real and oracle-verified.
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
    "q58_multimodal_batch_embed" -> QueryDef.sql(
      "Batched embedding inference over a media BINARY column — the " +
      "GPU-inference pipeline shape: model init once per partition, " +
      "fixed-size 32-row batches streamed through one forward call each " +
      "(memory bounded at O(batch)). Encoder is the deterministic fake " +
      "(no codecs in this container), which makes it ORACLE-CHECKABLE: " +
      "the DuckDB twin re-computes the same 64-bit wrapping byte roll in " +
      "HUGEINT-mod-2^64 arithmetic, converts to signed, and reproduces " +
      "Java's arithmetic shifts and float32 division bit-for-bit. The " +
      "engine-specific batch ids stay OUT of the verified projection " +
      "(partition-layout-dependent by design); the batching contract " +
      "itself is asserted in BinaryDecodeSpec.",
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS hs,
        |         octet_length(encode(text)) AS nb
        |  FROM documents
        |), r AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(1125899906842597::HUGEINT,
        |        list_transform(range(1, nb + 1),
        |          i -> ((strpos('0123456789ABCDEF', substr(hs, 2*i-1, 1)) - 1) * 16
        |              + strpos('0123456789ABCDEF', substr(hs, 2*i, 1)) - 1)::HUGEINT)),
        |      (h, c) -> (h * 31 + c) % 18446744073709551616::HUGEINT) AS hu
        |  FROM hx
        |), s AS (
        |  SELECT doc_id,
        |    CASE WHEN hu >= 9223372036854775808::HUGEINT
        |         THEN (hu - 18446744073709551616::HUGEINT)::BIGINT
        |         ELSE hu::BIGINT END AS h
        |  FROM r
        |), f AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(range(0, 8),
        |      j -> (((h >> (j*7)) % 1000 + 1000) % 1000)::FLOAT / 1000.0::FLOAT) AS emb
        |  FROM s
        |)
        |SELECT media_id, emb[1]::FLOAT AS e0,
        |  sqrt(list_reduce(list_prepend(0.0,
        |    list_transform(emb, x -> x::DOUBLE * x::DOUBLE)), (a,b) -> a+b)) AS e_norm
        |FROM f
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          lit("text").as("kind"),
          col("text").cast("binary").as("content"))
        .as[graft.multimodal.BinaryDecode.MediaRow]
      graft.multimodal.BinaryDecode.encodeBatched(media, batchSize = 32)
        .toDF()
        .select(col("media_id"),
          element_at(col("embedding"), 1).as("e0"),
          graft.functions.VectorFunctions.norm2(col("embedding")).as("e_norm"))
        .orderBy("media_id")
    }
  )
}
