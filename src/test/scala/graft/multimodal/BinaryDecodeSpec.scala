package graft.multimodal

import graft.SparkSpec
import graft.multimodal.BinaryDecode._
import org.apache.spark.sql.functions._

/** Multimodal plumbing: deterministic fake decode through mapPartitions,
  * schema shape, and frame sampling. */
class BinaryDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", "fake-image-bytes-aaaa".getBytes("UTF-8")),
    MediaRow(2L, "video", "fake-video-bytes-bbbb-with-more-content".getBytes("UTF-8")),
    MediaRow(3L, "audio", Array[Byte]())).toDS()

  test("decode is deterministic and preserves ids/bytes") {
    val a = BinaryDecode.decode(media).collect().sortBy(_.media_id)
    val b = BinaryDecode.decode(media).collect().sortBy(_.media_id)
    assert(a.map(_.width).toSeq == b.map(_.width).toSeq)
    assert(a.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(a.find(_.media_id == 1).get.n_bytes == 21)
    assert(a.forall(r => r.width >= 64 && r.width < 576))
    assert(a.forall(_.features.length == 8))
  }

  test("video rows get multi-frame counts; image/audio single frame") {
    val d = BinaryDecode.decode(media).collect().map(r => r.media_id -> r.n_frames).toMap
    assert(d(1L) == 1 && d(3L) == 1)
    assert(d(2L) >= 1 && d(2L) <= 30)
  }

  test("frame sampling emits every stride-th frame index") {
    val d = BinaryDecode.decode(media).toDF()
    val frames = sampleFrames(d, stride = 2)
      .where(col("media_id") === 2).select("frame_idx").as[Int].collect().sorted
    val n = BinaryDecode.decode(media).collect().find(_.media_id == 2).get.n_frames
    assert(frames.toSeq == (0 until n by 2).toSeq)
  }

  test("resizeFit preserves aspect, only downscales, clamps to 1px") {
    val d = BinaryDecode.decode(media).toDF()
    val out = resizeFit(d, maxDim = 100)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))).toMap
    out.values.foreach { case (w, h, ow, oh) =>
      assert(ow >= 1 && oh >= 1)
      assert(ow <= w && oh <= h, "resize must never inflate")
      assert(math.max(ow, oh) <= 100)
      // aspect preserved under floor arithmetic: out = floor(side*max/longest)
      val longest = math.max(w, h)
      assert(ow == math.min(w.toLong, math.max(1L, w.toLong * 100 / longest)).toInt)
      assert(oh == math.min(h.toLong, math.max(1L, h.toLong * 100 / longest)).toInt)
    }
    // a bounding box larger than every input leaves dimensions untouched
    val big = resizeFit(d, maxDim = 10000)
      .collect().foreach { r =>
        assert(r.getAs[Int]("out_width") == r.getAs[Int]("width"))
        assert(r.getAs[Int]("out_height") == r.getAs[Int]("height"))
      }
  }

  test("decode plumbing runs over real table bytes at scale shape") {
    val docs = graft.Tables.documents(spark, sf0001).limit(100)
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        col("text").cast("binary").as("content")).as[MediaRow]
    val out = BinaryDecode.decode(docs)
    assert(out.count() == 100)
    assert(out.where(col("n_bytes") === 0).count() == 0)
  }

  test("batched encode honors the batch contract: full batches + per-partition short tail only") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
        col("text").cast("binary").as("content"))
      .repartition(3).as[MediaRow]
    val out = BinaryDecode.encodeBatched(docs, batchSize = 32).collect()

    // every input row exactly once
    assert(out.length == 500 && out.map(_.media_id).distinct.length == 500)
    // batch sizes: never above 32; at most one short batch per partition
    assert(out.forall(_.batch_size <= 32))
    val perBatch = out.groupBy(_.batch_id).map { case (id, rows) =>
      assert(rows.map(_.batch_size).distinct.length == 1, s"batch $id inconsistent")
      (id, rows.length, rows.head.batch_size)
    }
    perBatch.foreach { case (id, n, declared) =>
      assert(n == declared, s"batch $id declared $declared rows but carried $n")
    }
    val shortBatches = perBatch.count(_._3 < 32)
    assert(shortBatches <= 3, s"more short batches ($shortBatches) than partitions (3)")

    // embeddings are content-deterministic across runs
    val again = BinaryDecode.encodeBatched(docs, batchSize = 32).collect()
    val e1 = out.map(r => r.media_id -> r.embedding.toSeq).toMap
    again.foreach(r => assert(e1(r.media_id) == r.embedding.toSeq))
  }
}
