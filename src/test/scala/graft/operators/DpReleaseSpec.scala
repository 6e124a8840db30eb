package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.functions.DeterministicHash

/** q247 semantic anchors: the released rows refold exactly from the
  * local double-hash (leading-zero geometric draws), and the MECHANISM
  * is validated distributionally — over 5e5 ids the noise matches the
  * discrete Laplace(p = 1/2) law P(k) = (1/3)(1/2)^|k| and is
  * symmetric, which is what makes the release (ln 2)-DP. The weaker
  * designs this replaced are pinned as counter-examples: trailing
  * zeros are parity-degenerate on this hash (P(noise = 0) = 1/2, odd
  * noise impossible), and a SINGLE hash round leaves the two salted
  * streams correlated even in the high bits (P(0) ~ 0.30 vs 1/3). */
class DpReleaseSpec extends SparkSpec {

  private def word(sid: Long, salt: Long): Long =
    DeterministicHash.knuth32Local(
      DeterministicHash.knuth32Local(sid, salt), salt)
  private def lz32(h: Long): Long =
    32L - java.lang.Long.toBinaryString(h | 1L).length.toLong
  private def noiseOf(sid: Long): Long =
    lz32(word(sid, DeterministicHash.dpSaltA)) -
      lz32(word(sid, DeterministicHash.dpSaltB))

  test("q247: rows refold exactly from the local hash; clamp holds") {
    val rows = SparkEntry.queries("q247_dp_count_release")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sid = r.getAs[String]("source").drop(3).toLong
      val expect = noiseOf(sid)
      assert(r.getAs[Long]("noise") == expect,
        s"${r.getAs[String]("source")}")
      assert(r.getAs[Long]("noisy_count")
        == math.max(0L, r.getAs[Long]("n_docs") + expect))
      assert(r.getAs[Long]("noisy_count") >= 0L)
      assert(r.getAs[Double]("epsilon") == 0.6931471805599453)
    }
  }

  test("q247 mechanism: noise is discrete Laplace(1/2) over a large id range") {
    val n = 500000
    val noises = (0 until n).map(i => noiseOf(i.toLong))
    val freq = noises.groupBy(identity).view.mapValues(_.length).toMap
    // P(noise = k) = (1/3) * (1/2)^|k| — check the mass at 0, +-1, +-2
    def p(k: Long) = freq.getOrElse(k, 0).toDouble / n
    assert(math.abs(p(0) - 1.0 / 3) < 0.005, s"p0 = ${p(0)}")
    Seq(1L, 2L).foreach { k =>
      val expect = (1.0 / 3) * math.pow(0.5, k.toDouble)
      assert(math.abs(p(k) - expect) < 0.005, s"p($k) = ${p(k)}")
      assert(math.abs(p(-k) - expect) < 0.005, s"p(-$k) = ${p(-k)}")
    }
    // symmetry => near-zero mean (|mean| well under one noise unit)
    val mean = noises.sum.toDouble / n
    assert(math.abs(mean) < 0.02, s"mean = $mean")
  }

  test("q247 counter-examples: the designs the mechanism must NOT use") {
    val n = 100000
    // (a) trailing zeros: XOR of two odd-multiplier limbs makes the
    // word's LSB parity-degenerate -> noise 0 half the time
    def tz(h: Long) =
      java.lang.Long.numberOfTrailingZeros(h | 2147483648L).toLong
    val tzNoise = (0 until n).map { i =>
      tz(DeterministicHash.knuth32Local(i.toLong, DeterministicHash.dpSaltA)) -
        tz(DeterministicHash.knuth32Local(i.toLong, DeterministicHash.dpSaltB))
    }
    val tzP0 = tzNoise.count(_ == 0L).toDouble / n
    assert(tzP0 > 0.45, s"tz degeneracy vanished? p0 = $tzP0")
    // (b) single-round leading zeros: salted streams stay correlated
    def lzSingle(i: Long, s: Long) =
      lz32(DeterministicHash.knuth32Local(i, s))
    val oneRound = (0 until n).map { i =>
      lzSingle(i.toLong, DeterministicHash.dpSaltA) -
        lzSingle(i.toLong, DeterministicHash.dpSaltB)
    }
    val oneP0 = oneRound.count(_ == 0L).toDouble / n
    assert(math.abs(oneP0 - 1.0 / 3) > 0.02,
      s"single round unexpectedly independent: p0 = $oneP0")
  }
}
