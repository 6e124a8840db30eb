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
    // Guard the internal/output namespace: a silent collision here would
    // produce ambiguous or wrong selects rather than a clear error.
    val reserved = Seq("__asof_tag", "__asof_state", "__asof_carried")
    val inputCols = (left.columns ++ right.columns).toSet
    require(reserved.forall(!inputCols(_)),
      s"joinAsOf: input columns may not use reserved names ${reserved.mkString(", ")}")
    require(rCols.forall(c => c != key && c != time),
      s"joinAsOf: rightCols may not repeat the key ('$key') or time ('$time') column")
    val carriedOut = leftValueCols.map(c => s"${c}_asof").toSet
    require((rCols :+ key :+ time).forall(!carriedOut(_)),
      s"joinAsOf: output name collision — carried columns ${carriedOut.mkString(", ")} " +
        "clash with right-side/key/time columns")
    // All carried values travel in ONE struct: last(ignoreNulls) then
    // skips only probe rows (whose struct is null), never a state row
    // whose individual VALUE is null — so a genuinely-null latest state
    // is preserved and multi-column carries always come from the same
    // left row.
    val stateStruct = struct(leftValueCols.map(col): _*)
    val nullStateType = org.apache.spark.sql.types.StructType(
      leftValueCols.map(c => left.schema(c).copy(name = c)))
    // tag 0 = left (state) sorts before tag 1 (probe) at equal ts =>
    // inclusive at-or-before semantics
    val l = left.select(
      Seq(col(key), col(time), lit(0).as("__asof_tag"), stateStruct.as("__asof_state")) ++
        rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      Seq(col(key), col(time), lit(1).as("__asof_tag"),
        lit(null).cast(nullStateType).as("__asof_state")) ++
        rCols.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof_carried", last(col("__asof_state"), ignoreNulls = true).over(w))
      .where(col("__asof_tag") === 1)
      .select(
        Seq(col(key), col(time)) ++ rCols.map(col) ++
          leftValueCols.map(c => col(s"__asof_carried.$c").as(s"${c}_asof")): _*)
  }
}
