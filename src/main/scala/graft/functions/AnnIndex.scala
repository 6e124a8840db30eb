package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF index build: spherical k-means over a bounded, deterministic
  * sample of the corpus, producing the L2-normalized centroid table the
  * [[graft.expressions.NearestCells]] expression assigns against.
  *
  * This is the offline index-build step of a real IVF deployment, sized
  * for a driver: ONE count + ONE bounded collect (<= sampleCap vectors,
  * stride-sampled on the id so it is deterministic and scale-independent),
  * then Lloyd iterations over at most sampleCap*dim doubles in memory. At
  * 100 TB the sample stays the same size — training cost does not grow
  * with the corpus; only the (embarrassingly parallel) assignment does.
  */
object AnnIndex {

  /** Train `k` spherical k-means centroids over `corpus` (columns: idCol,
    * vecCol ARRAY<DOUBLE>). Deterministic: hash-stride sample (uniform
    * for ANY id distribution — dense, sparse, offset, all-odd — where a
    * raw `id % stride` would bias or select nothing), hard-capped at
    * sampleCap rows by limit, stride-k init, fixed iteration count, ties
    * to the lower cell. Returns L2-normalized centroids. */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 10,
      sampleCap: Int = 4096): Array[Array[Double]] = {
    var sample = trainingSample(corpus, idCol, vecCol, sampleCap)
    if (sample.length < k) {
      // hash-unlucky tiny selection: fall back to the deterministic
      // id-ordered prefix (still <= sampleCap rows)
      sample = corpus.orderBy(col(idCol)).limit(sampleCap)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Double](0).toArray).map(normalize)
    }
    require(sample.length >= k, s"k-means: sample ${sample.length} < k=$k")

    // stride init over the (id-ordered) sample — deterministic
    var cents: Array[Array[Double]] =
      Array.tabulate(k)(i => sample((i.toLong * sample.length / k).toInt).clone())
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(k)(new Array[Double](cents(0).length))
      val ns = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(v, cents)
        addInto(sums(c), v)
        ns(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (ns(c) == 0) cents(c) // empty cell keeps its old centroid
        else normalize(sums(c).map(_ / ns(c)))
      }
      it += 1
    }
    cents
  }

  /** The bounded deterministic training sample: hash-stride selection,
    * id-ordered, HARD-capped at sampleCap rows by limit() — the collect
    * bound the 100 TB claim depends on. private[graft] so the cap is
    * testable as a contract. */
  private[graft] def trainingSample(
      corpus: DataFrame, idCol: String, vecCol: String,
      sampleCap: Int): Array[Array[Double]] = {
    val cnt = corpus.count()
    // ceil so the expected selection is <= sampleCap
    val stride = math.max(1L, (cnt + sampleCap - 1) / sampleCap)
    corpus
      .where(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
      .orderBy(col(idCol))
      .limit(sampleCap)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .map(normalize)
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var dot = 0.0
      var j = 0
      val cv = cents(c)
      while (j < v.length && j < cv.length) { dot += v(j) * cv(j); j += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  private def addInto(acc: Array[Double], v: Array[Double]): Unit = {
    var j = 0
    while (j < acc.length && j < v.length) { acc(j) += v(j); j += 1 }
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var j = 0
    while (j < v.length) { s += v(j) * v(j); j += 1 }
    val n = math.sqrt(s)
    if (n == 0.0 || n.isNaN) v else v.map(_ / n)
  }
}
