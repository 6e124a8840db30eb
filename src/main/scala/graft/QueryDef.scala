package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * the driver hash-compares against at sf0.01.
  *
  * Oracle-parity rules this codebase follows everywhere:
  *   - every computed/aggregate column is aliased to the SAME name on both
  *     sides (the driver sorts columns by name before hashing);
  *   - floating-point aggregates are wrapped in `round(x, N)` on BOTH
  *     sides, because summation order differs between engines and a raw
  *     double sum is not bit-stable;
  *   - any ranking/top-k is made deterministic with a full tie-break key;
  *   - sessions run with `spark.sql.ansi.enabled=false` +
  *     UTC session timezone so cast/arithmetic semantics line up with
  *     DuckDB's non-strict behavior (see Sessions.scala).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

object QueryDef {
  /** Oracle-verified query. */
  def sql(doc: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(oracle), doc)

  /** Non-SQL-expressible op (engine-specific hashing etc.) — the driver
    * records a weaker rows-only check. */
  def rowsOnly(doc: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None, doc)
}
