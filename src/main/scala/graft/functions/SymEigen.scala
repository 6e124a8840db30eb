package graft.functions

/** Deterministic Jacobi eigendecomposition for small symmetric matrices —
  * the driver-side half of distributed PCA: the cluster reduces 100 TB of
  * vectors to one d x d covariance (via [[CovMoments]], a few KB), the
  * driver diagonalizes it in microseconds, and the eigenbasis ships back
  * as plan literals for the distributed projection. Cyclic-by-rows Jacobi
  * with a fixed sweep order and a fixed sign convention, so the
  * decomposition is a pure function of the input matrix — no pivot
  * search, no randomness, no library dependence.
  */
object SymEigen {

  /** Eigen-decompose symmetric `a` (not mutated). Returns (eigenvalues,
    * eigenvectors-as-rows), sorted by eigenvalue DESCENDING, each vector
    * sign-fixed so its largest-|component| entry is positive (first such
    * index on ties) — the deterministic orientation PCA consumers need
    * for reproducible projections. */
  def decompose(a: Array[Array[Double]], maxSweeps: Int = 100,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    require(a.forall(_.length == d), "matrix not square")
    val m = Array.tabulate(d, d)((i, j) => {
      require(math.abs(a(i)(j) - a(j)(i)) <= 1e-9 * (1.0 + math.abs(a(i)(j))),
        s"matrix not symmetric at ($i,$j)")
      a(i)(j)
    })
    val q = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      math.sqrt(2.0 * s)
    }

    val scale = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = 0; while (j < d) { s = math.max(s, math.abs(m(i)(j))); j += 1 }; i += 1 }
      math.max(s, 1e-300)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm() > tol * scale * d) {
      var p = 0
      while (p < d - 1) {
        var r = p + 1
        while (r < d) {
          val apq = m(p)(r)
          if (apq != 0.0) {
            // classic Jacobi rotation zeroing m(p)(r)
            val theta = (m(r)(r) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case s0  => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val mkp = m(k)(p); val mkr = m(k)(r)
              m(k)(p) = c * mkp - s * mkr
              m(k)(r) = s * mkp + c * mkr
              k += 1
            }
            k = 0
            while (k < d) {
              val mpk = m(p)(k); val mrk = m(r)(k)
              m(p)(k) = c * mpk - s * mrk
              m(r)(k) = s * mpk + c * mrk
              k += 1
            }
            k = 0
            while (k < d) {
              val qkp = q(k)(p); val qkr = q(k)(r)
              q(k)(p) = c * qkp - s * qkr
              q(k)(r) = s * qkp + c * qkr
              k += 1
            }
          }
          r += 1
        }
        p += 1
      }
      sweep += 1
    }

    // columns of q are the eigenvectors; extract, orient, sort
    val pairs = Array.tabulate(d) { c =>
      val v = Array.tabulate(d)(k => q(k)(c))
      var best = 0
      var k = 1
      while (k < d) { if (math.abs(v(k)) > math.abs(v(best))) best = k; k += 1 }
      if (v(best) < 0.0) { k = 0; while (k < d) { v(k) = -v(k); k += 1 } }
      (m(c)(c), v)
    }
    val sorted = pairs.sortBy(-_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }
}
