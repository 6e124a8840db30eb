package graft.multimodal

import graft.SparkSpec
import graft.multimodal.BinaryDecode.ImageIoCodec
import graft.operators.MultimodalQueries

/** q270's perceptual-hash surface: PNG round-trip pixel exactness,
  * dHash semantics from REAL decoded rasters, shift invariance (the
  * byte-distinct-but-perceptually-identical property the query dedups
  * on), decode-failure contracts, and the catalog query's cluster
  * algebra against the driver-side formula. */
class DHashSpec extends SparkSpec {
  import spark.implicits._

  test("synthesized PNG round-trips pixel-exact through the real decoder") {
    val (a, b, shift) = (83, 97, 13)
    val bytes = MultimodalQueries.pngBytes(a, b, shift)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 9 && img.getHeight == 8)
    val r = img.getRaster
    for (y <- 0 until 8; x <- 0 until 9)
      assert(r.getSample(x, y, 0) == (a * x + b * y) % 200 + shift,
        s"pixel ($x,$y)")
  }

  test("dHash9x8 matches the analytic comparison bits for every class") {
    (0L until 24L).foreach { id =>
      val (a, b, shift) = MultimodalQueries.pngParams(id)
      val got = ImageIoCodec.dHash9x8(MultimodalQueries.pngBytes(a, b, shift))
      assert(got.isDefined)
      var expect = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if ((a * (x + 1) + b * y) % 200 > (a * x + b * y) % 200)
          expect |= 1L << (y * 8 + x)
      assert(got.get == expect, s"doc $id: got ${got.get} expect $expect")
    }
  }

  test("constant brightness shift never changes the hash, but changes every byte") {
    val h0 = ImageIoCodec.dHash9x8(MultimodalQueries.pngBytes(37, 29, 0)).get
    (1 until 56).foreach { sh =>
      val bytes = MultimodalQueries.pngBytes(37, 29, sh)
      assert(ImageIoCodec.dHash9x8(bytes).get == h0, s"shift $sh broke invariance")
    }
    // byte-distinct: the PNGs differ (different pixels -> different IDAT)
    val b0 = MultimodalQueries.pngBytes(37, 29, 0)
    val b1 = MultimodalQueries.pngBytes(37, 29, 1)
    assert(!java.util.Arrays.equals(b0, b1))
  }

  test("dHash9x8: an INDEXED-color PNG hashes by palette luma, not palette index") {
    // inverted 2-entry palette: index 0 = WHITE, index 1 = BLACK — a
    // raw band-0 read would call index 1 'brighter' and flip every bit
    val pal = new java.awt.image.IndexColorModel(1, 2,
      Array[Byte](-1, 0), Array[Byte](-1, 0), Array[Byte](-1, 0))
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_BYTE_BINARY, pal)
    val r = img.getRaster
    // index = x % 2 on every row: luma alternates 255,0,255,... so the
    // TRUE comparison luma(x+1) > luma(x) holds exactly at odd->even
    // transitions (index 1 -> 0), i.e. bits at odd x
    for (y <- 0 until 8; x <- 0 until 9) r.setSample(x, y, 0, x % 2)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val got = ImageIoCodec.dHash9x8(bos.toByteArray)
    assert(got.isDefined)
    // luma(x) = 255 if x even else 0, so luma(x+1) > luma(x) iff x odd
    var expect = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (x % 2 == 1) expect |= 1L << (y * 8 + x)
    assert(got.get == expect,
      s"palette-indexed hash must follow luma: got ${got.get} expect $expect")
  }

  test("dHash9x8: garbage bytes and wrong-size images -> None, never a throw") {
    assert(ImageIoCodec.dHash9x8(Array.fill(64)(0x5a.toByte)).isEmpty)
    assert(ImageIoCodec.dHash9x8(Array.emptyByteArray).isEmpty)
    val big = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", bos)
    assert(ImageIoCodec.dHash9x8(bos.toByteArray).isEmpty,
      "a non-9x8 image must be refused, not silently resampled")
  }

  test("q270: cluster algebra holds and hashes match the formula at sf0.001") {
    val rows = graft.SparkEntry.queries("q270_image_phash_dedup")(spark, sf0001)
      .as[(Long, Long, Long, Long, Boolean, Long)].collect()
    assert(rows.nonEmpty)
    val n = rows.length
    // every document hashed (drop-on-undecodable never fires on our PNGs)
    val docs = graft.Tables.documents(spark, sf0001).count()
    assert(n.toLong == docs)
    val byCluster = rows.groupBy(r => (r._2, r._3))
    byCluster.foreach { case ((hi, lo), members) =>
      assert(members.forall(_._4 == members.length.toLong),
        s"cluster ($hi,$lo): cluster_size disagrees")
      assert(members.count(_._5) == 1, s"cluster ($hi,$lo): canonical not unique")
      assert(members.filter(_._5).head._1 == members.map(_._1).min,
        s"cluster ($hi,$lo): canonical is not min doc_id")
      val shifts = members.map(m => (m._1 * 7) % 56).distinct.length.toLong
      assert(members.forall(_._6 == shifts), s"cluster ($hi,$lo): n_shifts wrong")
    }
    // hashes equal the analytic formula per doc
    rows.take(50).foreach { case (id, hi, lo, _, _, _) =>
      val (a, b, _) = MultimodalQueries.pngParams(id)
      var expect = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if ((a * (x + 1) + b * y) % 200 > (a * x + b * y) % 200)
          expect |= 1L << (y * 8 + x)
      assert(hi == (expect >>> 32) && lo == (expect & 0xFFFFFFFFL), s"doc $id")
    }
    // the perceptual point: some cluster absorbed >1 byte-distinct variant
    assert(byCluster.exists(_._2.head._6 > 1L),
      "expected at least one cluster with multiple brightness-shift variants")
  }
}
