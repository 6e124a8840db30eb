package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable as-of (point-in-time) join operator.
  *
  * For each right-side row, attaches the most recent left-side row with
  * the same key at-or-before its timestamp. Implemented as the scalable
  * union + last-value carry-forward plan: one hash partition + sort per
  * key, no per-key cross product — the formulation that survives 100 TB
  * where a range-condition join degenerates. (Preference order (a) of
  * the custom-operator ladder: composed built-ins express the semantics,
  * so no custom SparkPlan is warranted — SURVEY.md §4.2.)
  */
object AsOf {

  /** @param left   the "state" side providing carried-forward values
    * @param right  the "probe" side each of whose rows gets the latest
    *               left value at-or-before its time
    * @param key    equality key column present on both sides
    * @param time   event-time column present on both sides
    * @param leftValueCols left columns to carry (will appear suffixed
    *               with `_asof` on the output)
    * @param rightCols right columns to keep (default: all)
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      leftValueCols: Seq[String],
      rightCols: Option[Seq[String]] = None): DataFrame = {
    val rCols = rightCols.getOrElse(right.columns.toSeq.filterNot(c => c == key || c == time))
    // tag 0 = left (state) sorts before tag 1 (probe) at equal ts =>
    // inclusive at-or-before semantics
    val l = left.select(
      Seq(col(key), col(time), lit(0).as("__asof_tag")) ++
        leftValueCols.map(c => col(c).as(s"__asof_$c")) ++
        rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      Seq(col(key), col(time), lit(1).as("__asof_tag")) ++
        leftValueCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__asof_$c")) ++
        rCols.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = leftValueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"${c}_asof", last(col(s"__asof_$c"), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__asof_tag") === 1)
      .select(
        Seq(col(key), col(time)) ++ rCols.map(col) ++
          leftValueCols.map(c => col(s"${c}_asof")): _*)
  }
}
