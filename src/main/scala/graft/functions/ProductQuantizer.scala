package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization codebook training + column builders (q268's
  * compressed-ANN path; complements AnnIndex's IVF coarse quantizer).
  *
  * Training posture at 100 TB: PQ codebooks are, by standard practice,
  * trained on a bounded sample — the codebook is m*ksub*dsub doubles
  * (1,024 at m=8, ksub=16, 64 dims) and its quality saturates at a few
  * thousand training points, so the sample cap is corpus-size-INDEPENDENT.
  * [[train]] reuses AnnIndex's deterministic hash-stride, id-ordered,
  * hard-capped, unit-normalized sample (the collect bound the 100 TB
  * claim depends on), then runs one driver-side L2 Lloyd per subspace:
  * stride init over the ordered sample, FIXED iteration count, ordered
  * folds, ties to the lower code, starved cells keep their old centroid —
  * bit-deterministic for a fixed corpus. ENCODING (the corpus-sized pass)
  * is the narrow [[graft.expressions.PqEncodePacked]] projection; nothing
  * corpus-sized ever reaches the driver.
  */
object ProductQuantizer {

  /** Train `m` per-subspace codebooks of `ksub` centroids each over the
    * UNIT vectors of (idCol, vecCol). Returns codebooks[m][ksub][dim/m].
    * The vector width must divide evenly into `m` subspaces. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iterations: Int = 10, sampleCap: Int = 4096,
      // pass the corpus row count when the caller already has it (the
      // q47 knownCount convention) — skips a redundant full-scan job
      knownCount: Option[Long] = None)
      : Array[Array[Array[Double]]] = {
    require(m >= 1, s"pq train: m=$m")
    require(ksub >= 1, s"pq train: ksub=$ksub")
    // Drop zero-norm rows from the primary sample: AnnIndex.normalize
    // passes them through unchanged (they'd enter Lloyd and pull
    // centroids toward the origin), while the fallback path below and
    // the ENCODER both reject them — all three paths must agree on the
    // trained population (r14 advice).
    var sample = AnnIndex.trainingSample(corpus, idCol, vecCol, sampleCap, knownCount)
      .filter(v => v.exists(x => x != 0.0 && !x.isNaN))
    if (sample.length < ksub) {
      // hash-unlucky tiny selection: deterministic id-ordered prefix
      // (same fallback as AnnIndex.trainCentroids)
      sample = corpus.orderBy(col(idCol)).limit(sampleCap)
        .select(col(vecCol).cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toArray)
        .map(unit).filter(_.nonEmpty)
    }
    require(sample.length >= ksub,
      s"pq train: sample ${sample.length} < ksub=$ksub — corpus too small " +
        "for this codebook size")
    val dim = sample(0).length
    require(dim % m == 0, s"pq train: $dim dims do not divide into m=$m subspaces")
    sample.zipWithIndex.foreach { case (v, i) =>
      require(v.length == dim,
        s"pq train: sample vector $i has ${v.length} elements, expected $dim")
    }
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloydL2(sub, ksub, iterations)
    }
  }

  /** Plain L2 Lloyd (NOT spherical — subvectors are fragments of unit
    * vectors, not unit vectors themselves): deterministic stride init,
    * fixed rounds, ties to the lower centroid, empty cells keep their old
    * centroid. */
  private def lloydL2(points: Array[Array[Double]], k: Int,
      iterations: Int): Array[Array[Double]] = {
    var cents = Array.tabulate(k)(i => points((i.toLong * points.length / k).toInt).clone())
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(k)(new Array[Double](cents(0).length))
      val ns = new Array[Long](k)
      points.foreach { p =>
        val c = nearestL2(p, cents)
        var j = 0
        while (j < p.length) { sums(c)(j) += p(j); j += 1 }
        ns(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (ns(c) == 0) cents(c) else sums(c).map(_ / ns(c))
      }
      it += 1
    }
    cents
  }

  private[graft] def nearestL2(p: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var d = 0.0
      var j = 0
      while (j < p.length) { val dl = p(j) - cv(j); d += dl * dl; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def unit(v: Array[Double]): Array[Double] = {
    var ss = 0.0
    var j = 0
    while (j < v.length) { ss += v(j) * v(j); j += 1 }
    val n = math.sqrt(ss)
    if (n > 0) v.map(_ / n) else Array.empty[Double]
  }

  /** Flat m*ksub inner-product ADC table for one UNIT query vector:
    * entry s*ksub+c = dot(q_sub_s, codebook_s_c), so summing one entry
    * per subspace reconstructs dot(q, decode(code)) ~= cos(q, v). */
  def adcTable(qUnit: Array[Double],
      books: Array[Array[Array[Double]]]): Array[Double] = {
    val m = books.length
    val ksub = books(0).length
    val out = new Array[Double](m * ksub)
    var off = 0
    var s = 0
    while (s < m) {
      val book = books(s)
      val dsub = book(0).length
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var j = 0
        while (j < dsub) { acc += qUnit(off + j) * book(c)(j); j += 1 }
        out(s * ksub + c) = acc
        c += 1
      }
      off += dsub
      s += 1
    }
    out
  }

  private def bridge = org.apache.spark.sql.graftbridge.ColumnBridge

  /** Packed PQ code of (vector, norm) — narrow native projection. */
  def pqEncode(v: Column, nrm: Column,
      books: Array[Array[Array[Double]]]): Column =
    bridge.column(graft.expressions.PqEncodePacked(
      bridge.expression(v), bridge.expression(nrm), books))

  /** ADC scores of a packed-code column against every query table —
    * array<double> of tables.length scores, join-free. */
  def pqAdcScores(codes: Column, tables: Array[Array[Double]],
      m: Int, ksub: Int): Column =
    bridge.column(graft.expressions.PqAdcScores(
      bridge.expression(codes), tables, m, ksub))

  /** ADC score of a packed-code column against ONE table column (flat
    * m*ksub array) — the joined form for cell-restricted candidates. */
  def pqAdcScore(codes: Column, table: Column, m: Int, ksub: Int): Column =
    bridge.column(graft.expressions.PqAdcScore(
      bridge.expression(codes), bridge.expression(table), m, ksub))
}
