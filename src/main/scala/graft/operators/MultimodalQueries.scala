package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque BINARY columns
  * with typed metadata extracted by deterministic expressions.
  *
  * The decode layer (graft.multimodal.BinaryDecode) is pluggable and
  * REAL for three modalities on the bare JDK: image decode + pixel
  * resize (javax.imageio — BinaryDecodeSpec drives actual PNGs),
  * audio decode (javax.sound.sampled — real WAV/PCM: sample rate,
  * channels, frame count, peak envelope), and video CONTAINER
  * metadata (pure-JVM ISO-BMFF box parsing); only video FRAME
  * decoding remains an honest stub (no JDK codec exists). q40/q58
  * run over the SYNTHETIC corpus, whose binary column is text bytes
  * rather than encoded media, so they use the deterministic fake
  * path; q266 closes the oracle gap for audio (r12 verdict item 7)
  * by synthesizing real WAVs in-engine and making the REAL decoder
  * earn oracle-computed expectations.
  */
object MultimodalQueries {

  /** q266's WAV synthesis parameters — pure functions of doc_id, so
    * the DuckDB oracle can compute every expected decoded field
    * WITHOUT decoding anything while the engine must round-trip real
    * bytes through javax.sound.sampled to reproduce them. */
  private[graft] val wavRates = Array(8000, 11025, 16000, 22050, 44100)
  private[graft] def wavParams(docId: Long): (Int, Int, Int, Double) = {
    val rate = wavRates((docId % 5).toInt)
    val channels = 1 + (docId % 2).toInt
    val frames = 500 + (docId % 1500).toInt
    val amp = (docId % 10).toInt / 10.0 // 0.0 (silence) .. 0.9
    (rate, channels, frames, amp)
  }

  /** A real in-memory 16-bit PCM WAV: `channels`-channel 440 Hz sine at
    * `amp` full-scale (silence at 0), exact frame count — synthesized
    * through the JDK's own writer so the bytes carry a genuine RIFF/
    * WAVE header, not a hand-rolled one. */
  private[graft] def wavBytes(frames: Int, sampleRate: Float, amp: Double,
      channels: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * 2 * channels)
    var i = 0
    while (i < frames) {
      val s = (amp * 32767 *
        math.sin(2 * math.Pi * 440 * i / sampleRate)).toInt
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

  /** q267's ISO-BMFF synthesis parameters — pure functions of doc_id
    * (the q266 pattern for the video container parser): timescale,
    * whole-second duration, frame count, presentation size, and which
    * mvhd layout (v0 32-bit / v1 64-bit duration) the box carries. */
  private[graft] def mp4Params(docId: Long): (Int, Int, Int, Int, Int) = {
    val ts = Array(600, 1000, 24000, 90000)((docId % 4).toInt)
    val secs = 1 + (docId % 20).toInt
    val frames = 12 * (1 + (docId % 25).toInt)
    val w = 160 + 16 * (docId % 20).toInt
    val h = 120 + 8 * (docId % 30).toInt
    (ts, secs, frames, w, h)
  }

  /** A minimal but structurally faithful ISO-BMFF container: ftyp +
    * moov{mvhd, video trak{tkhd(wxh), mdia{hdlr'vide', minf{stbl{
    * stsz(frames)}}}}, audio trak{tkhd, mdia{hdlr'soun'}}} — every
    * offset the parser reads is real (big-endian sizes, 16.16 fixed
    * presentation size, v0/v1 mvhd layouts). */
  private[graft] def mp4Bytes(timescale: Int, duration: Long, frames: Int,
      w: Int, h: Int, mvhdV1: Boolean): Array[Byte] = {
    def be(i: Int) = java.nio.ByteBuffer.allocate(4).putInt(i).array()
    def be8(l: Long) = java.nio.ByteBuffer.allocate(8).putLong(l).array()
    def box(t: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be(8 + body.length) ++ t.getBytes("ISO-8859-1") ++ body
    }
    val mvhd =
      if (mvhdV1) box("mvhd", Array[Byte](1, 0, 0, 0),
        new Array[Byte](16), be(timescale), be8(duration), new Array[Byte](80))
      else box("mvhd", new Array[Byte](12), be(timescale),
        be(duration.toInt), new Array[Byte](80))
    val trakV = box("trak",
      box("tkhd", new Array[Byte](76), be(w << 16), be(h << 16)),
      box("mdia",
        box("hdlr", new Array[Byte](8), "vide".getBytes("ISO-8859-1"), new Array[Byte](13)),
        box("minf", box("stbl", box("stsz", be(0), be(0), be(frames))))))
    val trakA = box("trak",
      box("tkhd", new Array[Byte](84)),
      box("mdia",
        box("hdlr", new Array[Byte](8), "soun".getBytes("ISO-8859-1"), new Array[Byte](13))))
    box("ftyp", "isom".getBytes("ISO-8859-1"), be(0)) ++ box("moov", mvhd, trakV, trakA)
  }

  /** q270's image-synthesis parameters — pure functions of doc_id (the
    * q266 pattern for the image codec): 12 gradient classes (a, b) and
    * 56 brightness shifts. (class, shift) has period lcm(12, 8) = 24
    * (shift = 7*id mod 56 cycles every 8 ids), so each dHash cluster
    * holds up to 8 DISTINCT shifts — same-class docs with different
    * shifts are byte-distinct (different pixels -> different PNG
    * bytes) yet dHash-identical, while docs 24 apart repeat bytes
    * exactly. A constant shift cannot flip a neighbor comparison
    * because the gradient peaks at 199 and 199 + 55 = 254 stays inside
    * 8 bits — no wrap, so perceptual dedup groups byte-distinct
    * variants byte-level dedup cannot (n_shifts counts them). */
  // hoisted: pngParams runs per document row inside q270's executor-
  // side flatMap — fresh Array literals per call were measurable churn
  private val pngA = Array(37, 83, 121, 169)
  private val pngB = Array(29, 97, 151)

  private[graft] def pngParams(docId: Long): (Int, Int, Int) = {
    val cls = (docId % 12).toInt
    val a = pngA(cls % 4)
    val b = pngB(cls / 4)
    val shift = ((docId * 7) % 56).toInt
    (a, b, shift)
  }

  /** A real 9x8 grayscale PNG (javax.imageio encoder) whose pixel
    * (x, y) is ((a*x + b*y) % 200) + shift — the dHash grid size, so
    * the certified hash needs no engine-internal resampling. */
  private[graft] def pngBytes(a: Int, b: Int, shift: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        r.setSample(x, y, 0, (a * x + b * y) % 200 + shift)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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
    },

    // --------------------------------------------------------------- q266
    "q266_audio_wav_roundtrip" -> QueryDef.sql(
      "REAL audio decode, oracle-certified (r12 verdict item 7): per " +
      "document a genuine RIFF/WAVE 16-bit PCM clip is synthesized " +
      "in-engine (440 Hz sine; rate/channels/frames/amplitude are pure " +
      "functions of doc_id) and round-tripped through the REAL " +
      "javax.sound.sampled decoder; the row emits the DECODED sample " +
      "rate, channel count, frame count, integer duration and a " +
      "peak-envelope verdict (|decoded peak - synthesized amplitude| " +
      "<= 0.02, silence included). The oracle computes every expected " +
      "field from the doc_id formulas WITHOUT decoding — the engine " +
      "can only match by actually parsing the WAV (a header-offset, " +
      "rate-rounding or channel-interleave bug hash-fails every row; " +
      "an undecodable row is DROPPED and fails the row-count compare). " +
      "All integers + one pinned boolean -> hash-exact. Shape at " +
      "100 TB: encode+decode is one mapPartitions pass, row-local, " +
      "bounded bytes per row (<= 2000 frames) — the certification a " +
      "multimodal ingest runs on a fixture slice before trusting its " +
      "codec fleet.",
      """WITH p AS (SELECT doc_id,
        |    CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 11025
        |      WHEN 2 THEN 16000 WHEN 3 THEN 22050 ELSE 44100 END AS rate,
        |    (1 + doc_id % 2) AS channels,
        |    (500 + doc_id % 1500) AS frames
        |  FROM documents)
        |SELECT doc_id, rate::BIGINT AS sample_rate,
        |  channels::BIGINT AS channels, frames::BIGINT AS n_frames,
        |  ((frames * 1000) // rate)::BIGINT AS duration_ms,
        |  true AS peak_ok
        |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val (rate, ch, fr, amp) = wavParams(id)
          graft.multimodal.BinaryDecode.MediaRow(id, "audio",
            wavBytes(fr, rate.toFloat, amp, ch))
        }
      graft.multimodal.BinaryDecode
        .decode(media, graft.multimodal.BinaryDecode.AudioCodec)
        .toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("sample_rate"),
          col("height").cast("long").as("channels"),
          col("n_frames").cast("long").as("n_frames"),
          expr("cast(n_frames as bigint) * 1000 DIV width")
            .as("duration_ms"),
          (abs(array_max(col("features")).cast("double")
            - (col("media_id") % 10).cast("double") / 10.0) <= 0.02)
            .as("peak_ok"))
        .orderBy("doc_id")
    },

    // --------------------------------------------------------------- q267
    "q267_video_container_roundtrip" -> QueryDef.sql(
      "REAL video-container parsing, oracle-certified (the q266 " +
      "pattern for ISO-BMFF): per document a structurally faithful " +
      "MP4 container is synthesized in-engine (timescale, whole-" +
      "second duration, frame count, presentation size and the " +
      "v0/v1 mvhd layout are pure functions of doc_id; odd doc_ids " +
      "carry the 64-bit-duration v1 box) and parsed by the REAL " +
      "pure-JVM box parser; the row emits the PARSED width/height " +
      "(16.16 fixed tkhd), stsz frame count, integer duration, " +
      "timescale and track census. The oracle computes every field " +
      "from the doc_id formulas without parsing — a box-offset, " +
      "fixed-point or version-layout bug hash-fails every row; an " +
      "unparseable container is DROPPED and fails the row count. " +
      "All integers -> hash-exact. Shape at 100 TB: one row-local " +
      "mapPartitions pass, bounded bytes per row — with q266, the " +
      "codec-fleet certification a multimodal ingest runs on a " +
      "fixture slice.",
      """WITH p AS (SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |      WHEN 2 THEN 24000 ELSE 90000 END AS ts,
        |    (1 + doc_id % 20) AS secs,
        |    (12 * (1 + doc_id % 25)) AS fr,
        |    (160 + 16 * (doc_id % 20)) AS w,
        |    (120 + 8 * (doc_id % 30)) AS h
        |  FROM documents)
        |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
        |  fr::BIGINT AS n_frames, secs::BIGINT AS duration_sec,
        |  ts::BIGINT AS timescale, 2::BIGINT AS n_tracks,
        |  1::BIGINT AS n_video, 1::BIGINT AS n_audio
        |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val (ts, secs, fr, w, h) = mp4Params(id)
          graft.multimodal.BinaryDecode.MediaRow(id, "video",
            mp4Bytes(ts, ts.toLong * secs, fr, w, h, mvhdV1 = id % 2 == 1))
        }
      graft.multimodal.BinaryDecode
        .decode(media, graft.multimodal.BinaryDecode.VideoCodec)
        .toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          // duration = timescale * whole seconds by construction, so
          // features(0) is an exact small integer in float
          element_at(col("features"), 1).cast("long").as("duration_sec"),
          element_at(col("features"), 2).cast("long").as("timescale"),
          element_at(col("features"), 3).cast("long").as("n_tracks"),
          element_at(col("features"), 4).cast("long").as("n_video"),
          element_at(col("features"), 5).cast("long").as("n_audio"))
        .orderBy("doc_id")
    },

    // --------------------------------------------------------------- q270
    "q270_image_phash_dedup" -> QueryDef.sql(
      "REAL perceptual-hash image dedup, oracle-certified (the q266 " +
      "pattern for the image codec): per document a genuine 9x8 " +
      "grayscale PNG is synthesized in-engine (gradient class + " +
      "brightness shift are pure functions of doc_id), round-tripped " +
      "through the REAL javax.imageio decoder, and dHashed from the " +
      "DECODED raster samples — bit y*8+x set when luma(x+1,y) > " +
      "luma(x,y). The oracle computes the expected 64-bit hash " +
      "ANALYTICALLY from the doc_id formulas without any codec (the " +
      "grid is generated at the dHash size, so no engine-internal " +
      "resampling enters the verified surface; hash halves ride as two " +
      "BIGINTs to dodge sign-bit divergence). The engine can only " +
      "match by actually decoding the PNG — a raster-offset, " +
      "color-managed-getRGB, or bit-order bug hash-fails every row; an " +
      "undecodable row is DROPPED and fails the row-count compare. The " +
      "dedup itself is the point: each hash cluster absorbs up to 8 " +
      "BYTE-DISTINCT brightness variants (distinct shift -> distinct " +
      "pixels -> distinct PNG; ids 24 apart do repeat bytes — the " +
      "(class, shift) period) that byte-exact dedup (q33) cannot " +
      "group — n_shifts counts exactly those variants. Shape at " +
      "100 TB: synthesize+decode+hash is one narrow row-local pass, " +
      "dedup is ONE groupBy on the 64-bit hash — exactly q33's exact-" +
      "dedup economics with a decode in front.",
      """WITH p AS (SELECT doc_id,
        |    CASE (doc_id % 12) % 4 WHEN 0 THEN 37 WHEN 1 THEN 83
        |      WHEN 2 THEN 121 ELSE 169 END AS a,
        |    CASE (doc_id % 12) // 4 WHEN 0 THEN 29 WHEN 1 THEN 97
        |      ELSE 151 END AS b
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN ((a*(x+1) + b*y) % 200) > ((a*x + b*y) % 200)
        |          AND j >= 32 THEN (1::BIGINT << (j - 32)) ELSE 0 END)::BIGINT
        |      AS phash_hi,
        |    sum(CASE WHEN ((a*(x+1) + b*y) % 200) > ((a*x + b*y) % 200)
        |          AND j < 32 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
        |      AS phash_lo
        |  FROM p
        |  CROSS JOIN (SELECT tx.range AS x, ty.range AS y,
        |                (ty.range * 8 + tx.range) AS j
        |              FROM range(0, 8) tx, range(0, 8) ty) g
        |  GROUP BY doc_id),
        |cl AS (SELECT phash_hi, phash_lo, count(*)::BIGINT AS cluster_size,
        |         min(doc_id) AS canon,
        |         count(DISTINCT (doc_id * 7) % 56)::BIGINT AS n_shifts
        |       FROM bits GROUP BY 1, 2)
        |SELECT b.doc_id, b.phash_hi, b.phash_lo, cl.cluster_size,
        |  (b.doc_id = cl.canon) AS is_canonical, cl.n_shifts
        |FROM bits b JOIN cl USING (phash_hi, phash_lo)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val hashed = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val (a, b, shift) = pngParams(id)
          graft.multimodal.BinaryDecode.ImageIoCodec
            .dHash9x8(pngBytes(a, b, shift))
            .map(h => (id, h >>> 32, h & 0xFFFFFFFFL, shift.toLong))
        }
        .toDF("doc_id", "phash_hi", "phash_lo", "shift")
      val clusters = hashed.groupBy("phash_hi", "phash_lo")
        .agg(count(lit(1)).as("cluster_size"),
          min(col("doc_id")).as("canon"),
          countDistinct(col("shift")).as("n_shifts"))
      hashed.join(clusters, Seq("phash_hi", "phash_lo"))
        .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
          col("cluster_size"),
          (col("doc_id") === col("canon")).as("is_canonical"),
          col("n_shifts"))
        .orderBy("doc_id")
    }
  )
}
