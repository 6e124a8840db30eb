package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order ranking — the scale-safe replacement for
  * `Window.orderBy(...)` with no partition spec, which Spark plans as
  * `Exchange SinglePartition` + ONE task sorting the whole frame (the
  * former q106/q187/q195 shape; VERDICT r11 finding 3: fine at sf0.1,
  * a scale-killer at 10^9 groups).
  *
  * Shape (all passes fully parallel, nothing single-partition):
  *  1. one side pass sketches ~`buckets`-1 approximate quantile
  *     boundaries of the order column. ANY boundaries are CORRECT —
  *     only bucket balance depends on their quality — so the sketch's
  *     0.5% rank error never reaches the result;
  *  2. each row's range-bucket id is the count of boundaries strictly
  *     below (asc) / above (desc) its value, a PURE FUNCTION of the
  *     value against a driver literal — every pass agrees on bucket
  *     membership, with none of `repartitionByRange`'s per-run
  *     sampling nondeterminism (its RangePartitioner reseeds per RDD
  *     id, so two jobs over the same frame can disagree on
  *     boundaries — the classic two-pass-rank trap);
  *  3. one side pass folds per-bucket row counts (and value sums for
  *     running sums) — ≤ `buckets` rows, collected and prefix-summed
  *     on the driver (bounded by the knob, never by data) into a
  *     broadcast offsets frame;
  *  4. the rank window runs per bucket — a hash exchange with
  *     `buckets`-way parallelism — and adds the bucket's offset.
  *
  * Exactness: buckets are contiguous value ranges and bucket id is
  * monotone in the order key, so offset + local rank equals the
  * single-partition rank row for row; ntile is derived from the exact
  * global row_number with the ANSI bucket-size rule (first N mod n
  * buckets one row larger) in pure int64 `div` arithmetic — never a
  * double division, whose round-to-nearest can cross an integer and
  * shift a floor at ~1e9 rows.
  *
  * Skew: all rows sharing one value share a bucket (required for
  * correctness), so a heavy-hitter value lower-bounds one window
  * task — acceptable for the group-level frames these rank
  * (customers, parts, orders). The bucket expression is an O(buckets)
  * interpreted array filter per row; at the default 128 over
  * group-level frames that is noise, and the two side passes read
  * only the order column (pass `statsFrom` when chaining so they
  * fold the pre-window base, not prior rank windows).
  *
  * PRECONDITION: the order column must be non-NULL and non-NaN.
  * `Window.orderBy` would sort nulls first; here a null order value
  * gets a null bucket and the offsets join would DROP the row, and a
  * NaN always lands in one end bucket regardless of sort position
  * (ADVICE r12). These are generic shared utilities, so the counts
  * side pass — at zero extra jobs — counts NULL/NaN order values and
  * REFUSES loudly instead of silently corrupting ranks; callers with
  * nullable order keys pre-filter or bucket nulls explicitly.
  * (`statsFrom`, when passed, must hold the same order-column multiset
  * as df — the documented chaining contract — so guarding the stats
  * side guards df.)
  */
object RangeRank {

  /** Approximate quantile boundaries of `value` over `stats` — a
    * driver literal of at most `buckets`-1 doubles (bounded by the
    * knob, never by data). Runs one Spark job at plan-build time. */
  private def bounds(stats: DataFrame, value: String,
      buckets: Int): Array[Double] = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    if (probs.isEmpty) Array.empty[Double]
    else stats.select(col(value).cast("double").as(value))
      .stat.approxQuantile(value, probs, 0.005)
  }

  /** Range-bucket id: boundaries strictly below (asc) / above (desc)
    * the value — [[graft.expressions.RangeBucket]], one codegen'd
    * binary search per row. Monotone in the order key; equal values
    * always share a bucket. Double cast is order-preserving (merged
    * ties stay consistent) and exact for the int64-cents magnitudes
    * the catalog ranks (< 2^53). */
  private def bucketOf(bs: Array[Double], value: String,
      desc: Boolean): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.RangeBucket(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          col(value).cast("double")), bs, desc))

  /** Per-bucket (rowCount, valueSum) folded from `stats` and
    * prefix-summed on the driver: returns (offsets rows sorted by
    * bucket, total row count). `sumCol` empty → sums are 0. Enforces
    * the header's non-NULL/non-NaN order-key precondition in the same
    * pass: a null order value buckets to null (its group key is null
    * here) and a NaN trips the per-bucket `__x` counter. */
  private def offsets(stats: DataFrame, bucket: Column, value: String,
      sumCol: Option[String]): (Seq[(Int, Long, Long)], Long) = {
    val bad = badOrderKey(value)
    val base = sumCol match {
      case Some(sc) => stats.select(bucket.as("__b"), bad.as("__bad"),
          col(sc).cast("long").as("__s"))
        .groupBy("__b").agg(count(lit(1)).as("__n"), sum("__s").as("__t"),
          sum("__bad").as("__x"))
      case None => stats.select(bucket.as("__b"), bad.as("__bad"))
        .groupBy("__b").agg(count(lit(1)).as("__n"), lit(0L).as("__t"),
          sum("__bad").as("__x"))
    }
    val rows = base.collect()
      .map { r =>
        require(!r.isNullAt(0) && r.getLong(3) == 0L, nullOrderMsg(value))
        (r.getInt(0), r.getLong(1), r.getLong(2))
      }
      .sortBy(_._1)
    var cnt = 0L
    var tot = 0L
    val off = rows.map { case (b, n, s) =>
      val o = (b, cnt, tot); cnt += n; tot += s; o
    }
    (off.toSeq, cnt)
  }

  /** 1 when the order value would corrupt a range rank (NULL bucket →
    * dropped by the offsets join; NaN → order-blind bucket), else 0. */
  private def badOrderKey(value: String): Column = {
    val vd = col(value).cast("double")
    when(vd.isNull.or(isnan(vd)), 1L).otherwise(0L)
  }

  private def nullOrderMsg(value: String): String =
    s"RangeRank order column '$value' contains NULL or NaN rows — " +
      "Window.orderBy would keep them (nulls first) but a range rank " +
      "would silently drop or mis-bucket them; pre-filter or bucket " +
      "them explicitly at the call site"

  /** df + `out` (long) = global row_number over (value asc/desc, tie
    * asc) — identical, row for row, to
    * `row_number().over(Window.orderBy(...))` but with no
    * single-partition exchange. `statsFrom` (defaults to df) is the
    * frame the two side passes run against; it must hold the same
    * multiset of `value` rows as df — pass the pre-window base when
    * chaining rank columns so side passes don't re-execute prior
    * windows. */
  def withRowNumber(df: DataFrame, value: String, tie: String,
      out: String, desc: Boolean = false, buckets: Int = 128,
      statsFrom: DataFrame = null): DataFrame = {
    val stats = Option(statsFrom).getOrElse(df)
    val bs = bounds(stats, value, buckets)
    val bucket = bucketOf(bs, value, desc)
    val (off, _) = offsets(stats, bucket, value, None)
    rank(df, bucket, off, value, tie, desc, out)
  }

  /** df + `out` (long) = ANSI ntile(n) over (value asc/desc, tie
    * asc): exact global row_number (as above) mapped through the
    * standard bucket-size rule — first N mod n buckets hold
    * ceil(N/n) rows — in pure int64 `div` arithmetic. */
  def withNtile(df: DataFrame, value: String, tie: String, n: Int,
      out: String, desc: Boolean = false, buckets: Int = 128,
      statsFrom: DataFrame = null): DataFrame = {
    require(n > 0, "ntile bucket count must be positive")
    val stats = Option(statsFrom).getOrElse(df)
    val bs = bounds(stats, value, buckets)
    val bucket = bucketOf(bs, value, desc)
    val (off, nTot) = offsets(stats, bucket, value, None)
    val rn = "__rr_rn_" + out
    val ranked = rank(df, bucket, off, value, tie, desc, rn)
    val q = nTot / n
    val r = nTot % n
    val cut = r * (q + 1)
    val nt =
      if (q == 0L) col(rn)
      else expr(s"CASE WHEN $rn <= ${cut}L THEN ($rn + ${q}L) div ${q + 1}L " +
        s"ELSE ${r}L + ($rn - ${cut}L + ${q - 1}L) div ${q}L END")
    ranked.withColumn(out, nt.cast("long")).drop(rn)
  }

  /** Several ntile columns in TWO side passes total (vs 2 per rank):
    * one multi-column approxQuantile job for every distinct value
    * column, one exploded (dimension, bucket) count pass for all
    * offsets. Each spec is (value, tie, n, out); rank windows chain
    * left to right. q187's three RFM quintiles use this — 3 ntiles,
    * 2 side jobs, 0 single-partition exchanges. */
  def withNtiles(df: DataFrame,
      specs: Seq[(String, String, Int, String)], buckets: Int = 128,
      statsFrom: DataFrame = null): DataFrame = {
    require(specs.nonEmpty && specs.forall(_._3 > 0))
    val stats = Option(statsFrom).getOrElse(df)
    val values = specs.map(_._1).distinct
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bs: Map[String, Array[Double]] =
      if (probs.isEmpty) values.map(_ -> Array.empty[Double]).toMap
      else {
        val proj = stats.select(
          values.map(c => col(c).cast("double").as(c)): _*)
        values.zip(
          proj.stat.approxQuantile(values.toArray, probs, 0.005)).toMap
      }
    // one combined counts pass: explode each row into one (dimension,
    // bucket) pair per spec, fold counts — <= specs * buckets rows out
    val pairs = specs.zipWithIndex.map { case ((v, _, _, _), i) =>
      struct(lit(i).as("d"), bucketOf(bs(v), v, desc = false).as("b"),
        badOrderKey(v).as("x"))
    }
    val cnts = stats.select(explode(array(pairs: _*)).as("p"))
      .groupBy(col("p.d").as("d"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"), sum("p.x").as("x"))
      .collect().map { r =>
        require(!r.isNullAt(1) && r.getLong(3) == 0L,
          nullOrderMsg(specs(r.getInt(0))._1))
        (r.getInt(0), r.getInt(1), r.getLong(2))
      }
    specs.zipWithIndex.foldLeft(df) {
      case (acc, ((v, tie, n, out), i)) =>
        val mine = cnts.filter(_._1 == i).map(t => (t._2, t._3))
          .sortBy(_._1)
        var run = 0L
        val off = mine.map { case (b, c) =>
          val o = (b, run, 0L); run += c; o
        }.toSeq
        val nTot = run
        val rn = "__rr_rn_" + out
        val ranked = rank(acc, bucketOf(bs(v), v, desc = false), off,
          v, tie, desc = false, rn)
        val q = nTot / n
        val r = nTot % n
        val cut = r * (q + 1)
        val nt =
          if (q == 0L) col(rn)
          else expr(
            s"CASE WHEN $rn <= ${cut}L THEN ($rn + ${q}L) div ${q + 1}L " +
            s"ELSE ${r}L + ($rn - ${cut}L + ${q - 1}L) div ${q}L END")
        ranked.withColumn(out, nt.cast("long")).drop(rn)
    }
  }

  /** df + `out` (long) = running sum of `sumCol` (exact int64) over
    * (value asc/desc, tie asc) ROWS UNBOUNDED PRECEDING..CURRENT ROW —
    * per-bucket local running sum plus the broadcast prefix sum of
    * all earlier buckets. */
  def withRunningSum(df: DataFrame, value: String, tie: String,
      sumCol: String, out: String, desc: Boolean = false,
      buckets: Int = 128, statsFrom: DataFrame = null): DataFrame = {
    val stats = Option(statsFrom).getOrElse(df)
    val bs = bounds(stats, value, buckets)
    val bucket = bucketOf(bs, value, desc)
    val (off, _) = offsets(stats, bucket, value, Some(sumCol))
    val s = df.sparkSession
    import s.implicits._
    val offs = broadcast(off.toDF("__b", "__off", "__offsum"))
    val ord = if (desc) col(value).desc else col(value).asc
    val w = Window.partitionBy(col("__b")).orderBy(ord, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__b", bucket)
      .join(offs, "__b")
      .withColumn(out,
        (sum(col(sumCol).cast("long")).over(w) + col("__offsum"))
          .cast("long"))
      .drop("__b", "__off", "__offsum")
  }

  /** df + `out` (long, nullable) = STRICT-prefix running max of
    * `maxCol` over (value asc, tie asc) — i.e.
    * `max(maxCol) OVER (ORDER BY value, tie ROWS UNBOUNDED PRECEDING
    * TO 1 PRECEDING)`, null on the global first row — with no
    * single-partition exchange: a per-bucket strict-prefix window
    * plus the broadcast exclusive prefix max of all earlier buckets
    * (every earlier-bucket row is strictly earlier in the total
    * order because equal values always share a bucket). The q99
    * skyline's dominance prefix uses this; like every strict ROWS
    * frame, (value, tie) must be duplicate-free for the result to be
    * order-deterministic. */
  def withRunningMax(df: DataFrame, value: String, tie: String,
      maxCol: String, out: String, buckets: Int = 128,
      statsFrom: DataFrame = null): DataFrame = {
    val stats = Option(statsFrom).getOrElse(df)
    val bs = bounds(stats, value, buckets)
    val bucket = bucketOf(bs, value, desc = false)
    val raw = stats.select(bucket.as("__b"), badOrderKey(value).as("__bad"),
        col(maxCol).cast("long").as("__m"))
      .groupBy("__b").agg(max("__m").as("__mx"), sum("__bad").as("__x"))
      .collect().map { r =>
        require(!r.isNullAt(0) && r.getLong(2) == 0L, nullOrderMsg(value))
        (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
      }.sortBy(_._1)
    var run: Option[Long] = None
    val off = raw.map { case (b, m) =>
      val o = (b, run.getOrElse(0L), run.nonEmpty)
      run = (run.toList ++ m.toList).reduceOption((a: Long, b: Long) =>
        math.max(a, b))
      o
    }.toSeq
    val s = df.sparkSession
    import s.implicits._
    val offs = broadcast(off.toDF("__b", "__pm", "__pmset"))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col(value).asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__b", bucket)
      .join(offs, "__b")
      .withColumn(out, greatest(
        max(col(maxCol).cast("long")).over(w),
        when(col("__pmset"), col("__pm"))).cast("long"))
      .drop("__b", "__pm", "__pmset")
  }

  /** The shared rank tail: bucket column + broadcast offsets join +
    * per-bucket row_number window + offset. */
  private def rank(df: DataFrame, bucket: Column,
      off: Seq[(Int, Long, Long)], value: String, tie: String,
      desc: Boolean, out: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val offs = broadcast(off.map(o => (o._1, o._2)).toDF("__b", "__off"))
    val ord = if (desc) col(value).desc else col(value).asc
    val w = Window.partitionBy(col("__b")).orderBy(ord, col(tie).asc)
    df.withColumn("__b", bucket)
      .join(offs, "__b")
      .withColumn(out, row_number().over(w).cast("long") + col("__off"))
      .drop("__b", "__off")
  }
}
