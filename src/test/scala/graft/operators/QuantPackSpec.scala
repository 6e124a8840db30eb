package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q134 int8 quantization + q135 padding audit: bound anchors beyond
  * the DuckDB hash gate. */
class QuantPackSpec extends SparkSpec {
  import spark.implicits._

  test("q134: per-component error is bounded by half a quantization step") {
    val rows = SimilarityQueries.int8QuantizationAudit(
      graft.Tables.embeddings(spark, sf0001))
      .select("vec_id", "scale", "l2_err_sq", "linf_err", "n_zero")
      .as[(Long, Double, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, l2, linf, nz) =>
      assert(scale >= 0.0, s"$id")
      // symmetric rounding: |x - round(x/s)*s| <= s/2 (+ 1 ulp slack)
      assert(linf <= scale / 2 * (1 + 1e-12), s"$id: linf $linf > s/2 ${scale / 2}")
      assert(l2 >= 0.0 && l2 <= 64.0 * linf * linf * (1 + 1e-12),
        s"$id: l2 $l2 inconsistent with linf $linf")
      assert(nz >= 0 && nz <= 64, s"$id: n_zero $nz")
    }
    // quantization must be lossy-but-tight somewhere: at least one vector
    // has nonzero error, and no vector loses EVERY component to zero codes
    assert(rows.exists(_._3 > 0.0), "all-zero reconstruction error is suspicious")
    assert(rows.forall(_._5 < 64), "a vector with all-zero codes means scale blew up")
  }

  test("q139: quantized cosine tracks exact cosine within the int8 error budget") {
    val rows = graft.SparkEntry.queries(
      "q139_quantized_cosine_calibration")(spark, sf001)
      .select("vec_a", "vec_b", "cos", "qcos", "err")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, cos, qcos, err) =>
      assert(math.abs(err - (qcos - cos)) < 1e-15, s"($a,$b): err column lies")
      assert(qcos >= -1.0 - 1e-9 && qcos <= 1.0 + 1e-9, s"($a,$b): qcos $qcos")
      // int8 on 64 dims: quantized cosine stays within ~1.5% of exact —
      // the engineering fact this calibration exists to certify
      assert(math.abs(err) < 0.015, s"($a,$b): |err| ${math.abs(err)} >= 0.015")
    }
  }

  test("q135: batches respect the size cap, waste is in [0,1), totals reconcile") {
    val docs = graft.Tables.documents(spark, sf0001)
    val rows = TextQueries.paddingWaste(docs, bucketWidth = 16, batchSize = 32)
      .select("bucket", "batch", "n_docs", "max_len", "sum_len", "padded",
        "waste_frac")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._3 >= 1 && r._3 <= 32, s"batch size cap: $r")
      assert(r._6 == r._3 * r._4, s"padded = n_docs * max_len: $r")
      assert(r._5 <= r._6, s"useful tokens cannot exceed padded: $r")
      assert(r._7 >= 0.0 && r._7 < 1.0, s"waste fraction range: $r")
      // bucket width 16: within a bucket the max-min length gap < 16,
      // so padding waste per row is < 16 tokens
      assert(r._6 - r._5 < 16L * r._3, s"bucketing must bound waste: $r")
    }
    assert(rows.map(_._3).sum == docs.count(), "every doc lands in one batch")
    // only the LAST batch of a bucket may be short
    rows.groupBy(_._1).foreach { case (_, g) =>
      val maxBatch = g.map(_._2).max
      g.filter(_._2 < maxBatch).foreach(r =>
        assert(r._3 == 32, s"non-final batch must be full: $r"))
    }
  }
}
