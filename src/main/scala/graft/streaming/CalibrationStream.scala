package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q206's calibration audit: the 11-cell
  * (score_bin -> n, n_pos) grid maintained ONLINE as a streaming
  * aggregation over arriving (lang, text) documents — a plain groupBy
  * count in Complete mode (built-in incremental aggregation state; the
  * reliability diagram IS an aggregate, exactly like the q185 CMS
  * grid).
  *
  * Parity class: counts commute, so the streamed grid equals the batch
  * fold REGARDLESS of arrival order or micro-batch split — asserted
  * over the real sf0.001 corpus in StreamCheck and shuffled-order in
  * CalibrationStreamSpec, and q206's derived columns (pred_p,
  * emp_rate, Brier centi-mass, calibration gap) applied to the
  * streamed grid must reproduce the batch catalog row exactly — they
  * are per-cell algebra, so a deployed monitor derives them at read
  * time from 11 integers.
  *
  * STATE BOUND (the 100 TB/day contract): 11 cells TOTAL (score
  * clamped to [0, 10]), independent of corpus size or stream length.
  */
object CalibrationStream {

  /** The q206 integer grid (score_bin, n, n_pos) — the SAME fold in
    * batch and streaming over a frame with `lang` and `text` columns. */
  def calibrationCells(docs: DataFrame): DataFrame = {
    val en = TextFunctions.langVocab.toMap.apply("en")
    docs.select(
      when(col("lang") === "en", 1L).otherwise(0L).as("y"),
      least(TextFunctions.vocabHits(TextFunctions.tokens(col("text")), en)
        .cast("long"), lit(10L)).as("score_bin"))
      .groupBy("score_bin")
      .agg(count(lit(1)).as("n"), sum("y").cast("long").as("n_pos"))
  }

  /** q206's derived columns over a (score_bin, n, n_pos) grid — the
    * read-back a monitor applies to the 11 stored integers. */
  def readBack(cells: DataFrame): DataFrame =
    cells.select(col("score_bin"), col("n"), col("n_pos"),
      (col("score_bin").cast("double") / lit(10.0)).as("pred_p"),
      (col("n_pos").cast("double") / col("n").cast("double"))
        .as("emp_rate"),
      (col("n_pos") * (lit(10L) - col("score_bin"))
          * (lit(10L) - col("score_bin"))
        + (col("n") - col("n_pos")) * col("score_bin")
          * col("score_bin")).cast("long").as("brier_centi_sum"),
      abs(lit(10L) * col("n_pos") - col("score_bin") * col("n"))
        .cast("long").as("cal_gap_deci"))
}
