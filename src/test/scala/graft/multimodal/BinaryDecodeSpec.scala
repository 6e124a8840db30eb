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

  // -- real JDK image codec (javax.imageio) -------------------------------

  /** A real in-memory PNG: solid-color base with a white top-left
    * quadrant, exact dimensions known. */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2 && y < h / 2) 0xffffff else rgb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNGs to exact pixel dimensions through the Dataset path") {
    val real = Seq(
      MediaRow(1L, "image", pngBytes(100, 40, 0x000000)),
      MediaRow(2L, "image", pngBytes(37, 53, 0x808080)),
      MediaRow(3L, "audio", "not-an-image".getBytes("UTF-8"))).toDS()
    val out = BinaryDecode.decode(real, ImageIoCodec).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).width == 100 && out(1L).height == 40)
    assert(out(2L).width == 37 && out(2L).height == 53)
    // luminance histogram: normalized, deterministic, and actually
    // content-derived — image 1 is 3/4 black + 1/4 white
    val f1 = out(1L).features
    assert(math.abs(f1.sum - 1.0f) < 1e-3f)
    assert(math.abs(f1(0) - 0.75f) < 0.02f, s"black bin ${f1(0)}")
    assert(math.abs(f1(7) - 0.25f) < 0.02f, s"white bin ${f1(7)}")
    // audio fell through to the deterministic fake, not dropped
    assert(out.contains(3L) && out(3L).n_frames == 1)
    val again = BinaryDecode.decode(real, ImageIoCodec).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(out.keys.forall(k => again(k) == out(k).features.toSeq))
  }

  test("undecodable image bytes are dropped, not faked or crashed") {
    val mixed = Seq(
      MediaRow(1L, "image", pngBytes(16, 16, 0x123456)),
      MediaRow(2L, "image", "corrupt  garbage".getBytes("UTF-8")),
      MediaRow(3L, "image", Array[Byte]())).toDS()
    val out = BinaryDecode.decode(mixed, ImageIoCodec).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L),
      "only the valid PNG should survive the decode")
  }

  test("resizeBytes resamples real pixels with exactly resizeFit's geometry") {
    val content = pngBytes(640, 480, 0x336699)
    val resized = ImageIoCodec.resizeBytes(content, maxDim = 100).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    // floor geometry: 640x480 -> fit 100 -> 100 x floor(480*100/640)=75
    assert(img.getWidth == 100 && img.getHeight == 75)
    // and it matches the METADATA path (resizeFit) for the same input —
    // the two halves of the resize contract cannot drift
    val meta = resizeFit(
      BinaryDecode.decode(Seq(MediaRow(1L, "image", content)).toDS(), ImageIoCodec).toDF(),
      maxDim = 100).collect().head
    assert(meta.getAs[Int]("out_width") == img.getWidth)
    assert(meta.getAs[Int]("out_height") == img.getHeight)
    // no upscale: already-fitting image passes through at original size
    val same = ImageIoCodec.resizeBytes(pngBytes(30, 20, 0x000000), maxDim = 100).get
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(same))
    assert(img2.getWidth == 30 && img2.getHeight == 20)
    assert(ImageIoCodec.resizeBytes("junk".getBytes, 100).isEmpty)
  }

  // -- real JDK audio codec (javax.sound.sampled) -------------------------

  /** A real in-memory 16-bit PCM WAV: mono sine at `amp` full-scale, or
    * silence at amp=0. Exact frame count and sample rate known. */
  private def wavBytes(frames: Int, sampleRate: Float, amp: Double,
      channels: Int = 1): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * 2 * channels)
    var i = 0
    while (i < frames) {
      val s = (amp * 32767 * math.sin(2 * math.Pi * 440 * i / sampleRate)).toInt
      var c = 0
      while (c < channels) {
        val off = (i * channels + c) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioCodec decodes real WAVs: sample rate, channels, frame count, peak envelope") {
    val half = wavBytes(8000, 8000f, 0.5) // 1 s mono at 8 kHz, peak 0.5
    val out = BinaryDecode.decode(Seq(
      MediaRow(1L, "audio", half),
      MediaRow(2L, "audio", wavBytes(4410, 44100f, 0.9, channels = 2)),
      MediaRow(3L, "audio", wavBytes(1000, 16000f, 0.0)) // silence
    ).toDS(), AudioCodec).collect().map(r => r.media_id -> r).toMap
    // width := sample rate, height := channels, n_frames := PCM frames
    assert(out(1L).width == 8000 && out(1L).height == 1 && out(1L).n_frames == 8000)
    assert(out(2L).width == 44100 && out(2L).height == 2 && out(2L).n_frames == 4410)
    assert(out(3L).width == 16000 && out(3L).n_frames == 1000)
    // duration derives exactly: nFrames / sampleRate
    assert(math.abs(out(1L).n_frames.toDouble / out(1L).width - 1.0) < 1e-9)
    // envelope: every segment of a full-length sine peaks at ~amp;
    // silence is identically zero
    val env1 = out(1L).features
    assert(env1.length == 8)
    env1.foreach(p => assert(math.abs(p - 0.5f) < 0.01f, s"segment peak $p"))
    out(2L).features.foreach(p => assert(math.abs(p - 0.9f) < 0.01f))
    assert(out(3L).features.forall(_ == 0f))
    // determinism across runs
    val again = BinaryDecode.decode(Seq(MediaRow(1L, "audio", half)).toDS(),
      AudioCodec).collect().head
    assert(again.features.toSeq == env1.toSeq)
  }

  test("q266 catalog row: decoded fields earn the oracle formulas at sf0.001") {
    // the oracle computes rate/channels/frames/duration from the doc_id
    // formulas without decoding; the engine must reproduce them by
    // actually parsing the synthesized WAVs — re-assert that equality
    // here so a codec regression fails the suite, not just the driver
    val rows = graft.SparkEntry.queries("q266_audio_wav_roundtrip")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (rate, ch, fr, _) = graft.operators.MultimodalQueries.wavParams(id)
      assert(r.getLong(1) == rate.toLong, s"doc $id rate")
      assert(r.getLong(2) == ch.toLong, s"doc $id channels")
      assert(r.getLong(3) == fr.toLong, s"doc $id frames")
      assert(r.getLong(4) == fr.toLong * 1000L / rate, s"doc $id duration")
      assert(r.getBoolean(5), s"peak verdict not earned for doc $id")
    }
    // every synthesized clip must decode — a drop would shrink the row
    // count and fail the driver compare; pin it here too
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.length.toLong == nDocs)
  }

  test("truncated or corrupt audio bytes are dropped, not faked or crashed") {
    val good = wavBytes(2000, 8000f, 0.7)
    val mixed = Seq(
      MediaRow(1L, "audio", good),
      MediaRow(2L, "audio", good.take(40)), // header cut mid-chunk
      MediaRow(3L, "audio", "utterly not a riff file".getBytes("UTF-8")),
      MediaRow(4L, "audio", Array[Byte]())).toDS()
    val out = BinaryDecode.decode(mixed, AudioCodec).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L),
      "only the valid WAV should survive the decode")
  }

  // -------------------------------------------------------- MP4 fixture
  // Minimal but structurally faithful ISO-BMFF: ftyp + moov{mvhd,
  // trak{tkhd, mdia{hdlr'vide', minf{stbl{stsz}}}}, trak{tkhd,
  // mdia{hdlr'soun'}}} — every offset the parser reads is real.
  private def be(i: Int) = java.nio.ByteBuffer.allocate(4).putInt(i).array()
  private def be8(l: Long) = java.nio.ByteBuffer.allocate(8).putLong(l).array()
  private def bmffBox(t: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be(8 + body.length) ++ t.getBytes("ISO-8859-1") ++ body
  }
  private def mp4Bytes(timescale: Int = 1000, duration: Long = 5000,
      frames: Int = 150, w: Int = 320, h: Int = 240,
      mvhdV1: Boolean = false): Array[Byte] = {
    val mvhd =
      if (mvhdV1) bmffBox("mvhd", Array[Byte](1, 0, 0, 0),
        new Array[Byte](16), be(timescale), be8(duration), new Array[Byte](80))
      else bmffBox("mvhd", new Array[Byte](12), be(timescale),
        be(duration.toInt), new Array[Byte](80))
    val trakV = bmffBox("trak",
      bmffBox("tkhd", new Array[Byte](76), be(w << 16), be(h << 16)),
      bmffBox("mdia",
        bmffBox("hdlr", new Array[Byte](8), "vide".getBytes, new Array[Byte](13)),
        bmffBox("minf", bmffBox("stbl",
          bmffBox("stsz", be(0), be(0), be(frames))))))
    val trakA = bmffBox("trak",
      bmffBox("tkhd", new Array[Byte](84)),
      bmffBox("mdia",
        bmffBox("hdlr", new Array[Byte](8), "soun".getBytes, new Array[Byte](13))))
    bmffBox("ftyp", "isom".getBytes, be(0)) ++ bmffBox("moov", mvhd, trakV, trakA)
  }

  test("VideoCodec parses real ISO-BMFF container metadata: duration, tracks, size, frame count") {
    val out = BinaryDecode.decode(Seq(
      MediaRow(1L, "video", mp4Bytes()),
      MediaRow(2L, "video", mp4Bytes(timescale = 90000, duration = 270000L,
        frames = 72, w = 1920, h = 1080, mvhdV1 = true))
    ).toDS(), VideoCodec).collect().map(r => r.media_id -> r).toMap
    // tkhd presentation size and stsz sample count are byte-exact truth
    assert(out(1L).width == 320 && out(1L).height == 240, out(1L))
    assert(out(1L).n_frames == 150, out(1L))
    // features: [duration_sec, timescale, n_tracks, n_video, n_audio,..]
    assert(out(1L).features(0) == 5.0f && out(1L).features(1) == 1000f)
    assert(out(1L).features(2) == 2f && out(1L).features(3) == 1f &&
      out(1L).features(4) == 1f)
    // 64-bit duration + v1 mvhd layout parses too
    assert(out(2L).width == 1920 && out(2L).height == 1080)
    assert(out(2L).n_frames == 72 && out(2L).features(0) == 3.0f)
    assert(out(2L).features(1) == 90000f)
  }

  test("q267 catalog row: parsed container fields earn the oracle formulas at sf0.001") {
    val rows = graft.SparkEntry.queries("q267_video_container_roundtrip")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (ts, secs, fr, w, h) = graft.operators.MultimodalQueries.mp4Params(id)
      assert(r.getLong(1) == w.toLong && r.getLong(2) == h.toLong,
        s"doc $id size")
      assert(r.getLong(3) == fr.toLong, s"doc $id frames")
      assert(r.getLong(4) == secs.toLong, s"doc $id duration")
      assert(r.getLong(5) == ts.toLong, s"doc $id timescale")
      assert(r.getLong(6) == 2L && r.getLong(7) == 1L && r.getLong(8) == 1L,
        s"doc $id track census")
    }
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.length.toLong == nDocs)
  }

  test("truncated, lying-size or junk video bytes are dropped, not faked or crashed") {
    val good = mp4Bytes()
    val lyingSize = good.clone() // mvhd declares more bytes than its parent holds
    System.arraycopy(be(Int.MaxValue), 0, lyingSize, 24, 4)
    val out = BinaryDecode.decode(Seq(
      MediaRow(1L, "video", good),
      MediaRow(2L, "video", good.take(good.length / 2)), // cut inside moov
      MediaRow(3L, "video", lyingSize),
      MediaRow(4L, "video", "not an iso-bmff container".getBytes("UTF-8")),
      MediaRow(5L, "video", Array[Byte]()),
      MediaRow(6L, "video", bmffBox("moov", bmffBox("trak", be(0)))) // no mvhd
    ).toDS(), VideoCodec).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L),
      s"only the valid MP4 should survive: ${out.map(_.media_id).toSeq}")
  }

  test("JdkCodec dispatch: image, audio and video container metadata all parse for real") {
    val rows = Seq(
      MediaRow(1L, "image", pngBytes(24, 18, 0x404040)),
      MediaRow(2L, "audio", wavBytes(3000, 12000f, 0.25)),
      MediaRow(3L, "video", mp4Bytes(frames = 2500))).toDS()
    val out = BinaryDecode.decode(rows, JdkCodec).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).width == 24 && out(1L).height == 18) // real pixels
    assert(out(2L).width == 12000 && out(2L).n_frames == 3000) // real PCM
    assert(out(2L).features.max > 0.2f && out(2L).features.max < 0.3f)
    assert(out(3L).width == 320 && out(3L).n_frames == 2500) // real container
    // and the q40/q58 downstream shapes run unchanged over real video
    // metadata: frame sampling over the true stsz frame count
    val sampled = sampleFrames(BinaryDecode.decode(rows, JdkCodec).toDF(), stride = 1000)
      .where(col("media_id") === 3).count()
    assert(sampled == 3) // frames 0, 1000, 2000
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

  // ------------------------------------------------------------------
  // Adversarial media corpus (r13 verdict item 6): the Scaladoc claims
  // the parsers survive truncated boxes, junk bytes and lying size
  // fields — pin each claimed malice class explicitly, then sweep a
  // seeded byte-fuzz so the claim holds beyond the hand-picked cases.
  // ------------------------------------------------------------------

  test("ISO-BMFF malice classes: truncated mvhd, size past EOF, zero-size boxes, lying largesize") {
    def dec(b: Array[Byte]) = VideoCodec.decodeVideo(b)
    // truncated mvhd: payload shorter than any legal version layout
    assert(dec(bmffBox("moov", bmffBox("mvhd", Array[Byte](0, 0, 0, 0)))).isEmpty)
    assert(dec(bmffBox("moov", bmffBox("mvhd"))).isEmpty,
      "empty mvhd payload must not read past the box")
    // v1 flag with only a v0-sized payload
    assert(dec(bmffBox("moov", bmffBox("mvhd", Array[Byte](1, 0, 0, 0),
      new Array[Byte](16)))).isEmpty)
    // top-level size field pointing past EOF hides everything after it
    val pastEof = mp4Bytes().clone()
    System.arraycopy(be(pastEof.length * 4), 0, pastEof, 0, 4)
    assert(dec(pastEof).isEmpty,
      "a lying first-box size must not expose a moov beyond it")
    // zero-size ("runs to end of parent") box BEFORE mvhd swallows it
    val zeroSwallow = bmffBox("moov",
      be(0) ++ "free".getBytes("ISO-8859-1") ++ new Array[Byte](16))
    assert(dec(zeroSwallow).isEmpty, "zero-size box must terminate, not loop")
    // largesize marker (size32 == 1) with a truncated 64-bit length
    assert(dec(be(1) ++ "moov".getBytes("ISO-8859-1") ++ Array[Byte](0, 0)).isEmpty)
    // and a NEGATIVE largesize (bit 63 set) is a malformed header
    assert(dec(be(1) ++ "moov".getBytes("ISO-8859-1") ++
      be8(java.lang.Long.MIN_VALUE) ++ new Array[Byte](32)).isEmpty)
    // an 8-byte (empty-payload) box storm still terminates
    val storm = Array.fill(4096)(bmffBox("free")).flatten.toArray
    assert(dec(storm).isEmpty)
  }

  test("lying stsz sample_count clamps to 0 (unknown), never wraps negative") {
    // frames = -1 writes 0xFFFFFFFF into stsz's sample_count: a count
    // that cannot fit an Int must behave like an ABSENT stsz (0), not
    // surface as nFrames = -1 to downstream frame samplers
    val d = VideoCodec.decodeVideo(mp4Bytes(frames = -1))
    assert(d.nonEmpty, "the container is otherwise well-formed")
    assert(d.get.nFrames == 0, s"lying count must clamp to 0: ${d.get.nFrames}")
    assert(d.get.width == 320 && d.get.height == 240,
      "the rest of the metadata stays byte-exact")
  }

  test("WAV with a lying data-chunk length terminates with bounded, sane output") {
    val good = graft.operators.MultimodalQueries.wavBytes(1000, 8000f, 0.5, 1)
    val dataAt = good.indexOfSlice("data".getBytes("ISO-8859-1"))
    assert(dataAt > 0, "premise: the JDK writer emits a data chunk")
    // RIFF chunk sizes are LITTLE-endian
    def le(i: Int) = be(i).reverse
    // declared data length far beyond the real bytes
    val lying = good.clone()
    System.arraycopy(le(0x7FFFFF00), 0, lying, dataAt + 4, 4)
    val out = AudioCodec.decodeAudio(lying)
    // must terminate without throwing; if the JDK trusts the header the
    // envelope still reads only the REAL bytes (EOF-bounded scan) and
    // every feature stays a finite amplitude in [0, 1]
    out.foreach { d =>
      assert(d.features.length == 8)
      assert(d.features.forall(f => f >= 0f && f <= 1f && !f.isNaN))
      assert(d.width == 8000 && d.height == 1, "header rate/channels stay real")
    }
    // and a data length LYING SHORT must not over-read either
    val lyingShort = good.clone()
    System.arraycopy(le(4), 0, lyingShort, dataAt + 4, 4)
    AudioCodec.decodeAudio(lyingShort).foreach { d =>
      assert(d.features.length == 8 && d.nFrames <= 1000)
    }
  }

  test("seeded byte-fuzz: junk, truncations and flips never throw or hang in any codec") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val goodMp4 = mp4Bytes()
    val goodWav = graft.operators.MultimodalQueries.wavBytes(400, 8000f, 0.4, 2)
    def cases(good: Array[Byte]): Iterator[Array[Byte]] = {
      val junk = Iterator.fill(300) {
        val b = new Array[Byte](rnd.nextInt(256)); rnd.nextBytes(b); b
      }
      val truncs = Iterator.fill(150)(good.take(rnd.nextInt(good.length + 1)))
      val flips = Iterator.fill(150) {
        val b = good.clone()
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
        b
      }
      junk ++ truncs ++ flips
    }
    // Option out, exception never: the codecs' NonFatal catch is the
    // contract; any escape (OOM loop, StackOverflow from recursion)
    // fails this suite loudly. Termination is bounded by the suite's
    // wall clock — 600 cases per codec complete in seconds when the
    // parsers are EOF/parent-bounded as documented.
    cases(goodMp4).foreach { b =>
      val r = VideoCodec.decodeVideo(b)
      r.foreach(d => assert(d.nFrames >= 0 && d.features.length == 8))
    }
    cases(goodWav).foreach { b =>
      val r = AudioCodec.decodeAudio(b)
      r.foreach(d => assert(d.nFrames >= 0 && d.features.length == 8))
    }
    // images: ImageIO on junk is slower per call — a smaller sweep
    val png = pngBytes(9, 7, 0x112233)
    (Iterator.fill(60) {
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); b
    } ++ Iterator.fill(60)(png.take(rnd.nextInt(png.length + 1)))).foreach { b =>
      ImageIoCodec.decode("image", b).foreach(d =>
        assert(d.width >= 0 && d.height >= 0))
    }
  }
}
