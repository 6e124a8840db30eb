package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders (similarity search / near-dup):
  * dot product, norm and cosine over ARRAY<FLOAT|DOUBLE> columns.
  *
  * Parity-critical detail: every reduction is a *left fold in index
  * order* (`aggregate` over `zip_with`), never a SQL SUM over unnested
  * rows — IEEE double addition is order-sensitive, and a fixed fold order
  * makes Spark and DuckDB (list_reduce) produce bit-identical results, so
  * oracle comparisons need no tolerance. Elements are cast to double
  * before any arithmetic (float math would diverge from DuckDB's
  * promotion).
  */
object VectorFunctions {

  // element-wise widening via Cast (codegen'd), not a transform HOF —
  // an HOF anywhere in a Project knocks the operator out of codegen
  private def d(c: Column): Column = c.cast("array<double>")

  /** Index-ordered dot product. Native codegen'd expression, bit-identical
    * to the composed `aggregate(zip_with(...))` left fold (same IEEE
    * accumulation order — the DuckDB-parity anchor); property-tested in
    * TextVecSpec. */
  def dot(a: Column, b: Column): Column =
    bridge.column(graft.expressions.VecDot(
      bridge.expression(d(a)), bridge.expression(d(b))))

  /** Composed-HOF dot — reference semantics for the property test. */
  def dotComposed(a: Column, b: Column): Column = {
    val t = (c: Column) => transform(c, x => x.cast("double"))
    aggregate(zip_with(t(a), t(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  /** L2 norm as sqrt(dot(a,a)) — the self-product fold is the identical
    * IEEE accumulation sequence as aggregate(transform(v, x*x), 0.0, +). */
  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Sign-bit code over `planes` fixed hyperplanes: the random-hyperplane
    * LSH bucket id (cosine-preserving). Planes are generated driver-side
    * from a fixed seed and inlined as literals, so the bucketing is
    * deterministic and needs no broadcast join. */
  def hyperplaneCode(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, j) =>
        val plane = array(p.map(lit): _*)
        when(dot(v, plane) >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** Deterministic pseudo-random unit-ish hyperplanes from a fixed seed. */
  def makePlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def bridge = org.apache.spark.sql.graftbridge.ColumnBridge

  /** Indices of the nProbe nearest (by cosine) of `centroids` — a narrow
    * per-row projection (native expression), NOT a join: the centroid
    * table rides along like a broadcast literal. Centroids must be
    * L2-normalized. */
  def nearestCells(v: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    bridge.column(graft.expressions.NearestCells(bridge.expression(v), centroids, nProbe))

  /** Per-band hyperplane sign codes (array of `bands` longs) in one pass
    * — the LSH bucketing primitive. planes.length must divide into bands
    * evenly. */
  def bandedHyperplaneCodes(v: Column, planes: Seq[Array[Double]], bands: Int): Column =
    bridge.column(graft.expressions.BandedHyperplaneCodes(
      bridge.expression(v), planes.toArray, bands))

  /** All XOR masks within hamming distance `depth` of 0 over `bits` bits
    * (identity first, then single flips, then pairs, ...): the multi-probe
    * schedule for one LSH band. */
  def probeMasks(bits: Int, depth: Int): Seq[Long] = {
    require(bits >= 1 && bits <= 64, s"probeMasks: bits=$bits outside 1..64 (1L << j wraps)")
    def combos(from: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (from until bits).flatMap(j => combos(j + 1, left - 1).map(_ | (1L << j)))
    (0 to depth).flatMap(d => combos(0, d))
  }
}
