package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch q55 corpus-cleaning pipeline: documents
  * arrive as a stream (doc_id, ts, lang, text) and flow through
  *
  *   exact dedup (content hash, state bounded by the watermark) ->
  *   predicted-language gate -> quality gate -> length bounds
  *
  * — the ingest-time filter a training-data pipeline runs so duplicates
  * and junk never reach storage. All gates are the SAME native
  * expressions as the batch path (they are plain projections, so they
  * run unchanged under Structured Streaming); dedup uses
  * dropDuplicatesWithinWatermark so state for a content hash expires
  * once the watermark passes it — without that, dedup state grows with
  * the corpus forever.
  */
object CorpusCleanStream {

  def clean(
      docs: DataFrame,
      watermark: String = "1 hour",
      minQuality: Double = 0.4,
      minTokens: Int = 5): DataFrame = {
    val w = TextFunctions.tokens(col("text"))
    val punct = TextFunctions.charClassRatio(col("text"), "[^.,;:!?]")
    val en = TextFunctions.langVocab.toMap.apply("en")
    val stop = TextFunctions.vocabHits(w, en).cast("double") / size(w).cast("double")
    val hits = TextFunctions.langVocab.map { case (l, v) =>
      l -> TextFunctions.vocabHits(w, v).cast("long")
    }.toMap
    docs
      .withWatermark("ts", watermark)
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("n_tokens", size(w).cast("long"))
      .withColumn("quality", (lit(1) - punct) * (lit(0.5) + stop))
      .where(hits("en") >= hits("es") && hits("en") >= hits("de") &&
        hits("en") >= hits("fr") &&
        col("quality") >= minQuality && col("n_tokens") >= minTokens)
      .select("doc_id", "ts", "lang", "n_tokens", "quality")
  }
}
