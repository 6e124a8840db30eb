package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q185's count-min sketch: the depth-4 x width-256
  * cell grid maintained ONLINE as a streaming aggregation — each
  * arriving key increments its four (row, cell) coordinates, which is
  * a plain groupBy count over the exploded coordinates in Complete
  * mode (built-in incremental aggregation state; no custom
  * flatMapGroupsWithState needed — the sketch IS an aggregate).
  *
  * Parity with batch is the cleanest in the family: CMS increments are
  * commutative and associative, so the streamed grid equals the batch
  * grid REGARDLESS of arrival order or micro-batch split — asserted
  * over the real sf0.001 key stream in StreamCheck and shuffled-order
  * in SketchStreamSpec, and the q185 read-back (min over the key's
  * four cells) applied to the streamed grid must reproduce the batch
  * catalog row exactly.
  *
  * STATE BOUND (the 100 TB/day contract): d*w = 1,024 cells TOTAL,
  * independent of key cardinality or stream length — the reason a
  * deployed heavy-hitter monitor keeps a sketch, not per-key counts.
  */
object SketchStream {

  /** q185's row-hash family — the single source both the batch catalog
    * row and the streaming twin fold with. */
  val hashes: Seq[(Long, Long)] = Seq((1103515245L, 12345L),
    (214013L, 2531011L), (134775813L, 1L), (69069L, 362437L))

  val P = 2147483647L
  val Width = 256L

  /** The (row, cell) coordinate of key `k` under row hash `i`. */
  def cellOf(i: Int, k: Long): Long = {
    val (a, b) = hashes(i)
    ((a * k + b) % P) % Width
  }

  /** (row, cell, c) grid over a frame with a long key column `k` —
    * the SAME fold in batch and streaming (Complete mode): explode
    * each key into its four coordinates, count per coordinate. */
  def cmsCells(keys: DataFrame): DataFrame = {
    val coords = array(hashes.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i.toLong).as("row"),
        (((lit(a) * col("k") + lit(b)) % lit(P)) % lit(Width)).as("cell"))
    }: _*)
    keys.select(explode(coords).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
  }
}
