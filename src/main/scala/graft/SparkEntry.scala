package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full query catalog: each entry is one declared engine
  * capability (SURVEY.md §2.2 checklist row or north-star extension),
  * implemented Spark-first and — wherever ANSI-SQL-expressible — paired
  * with a DuckDB oracle for the driver's hash-compare at sf0.01.
  */
object SparkEntry {

  /** Ordered catalog of every declared capability. */
  lazy val catalog: ListMap[String, QueryDef] = ListMap(
    (operators.RelationalQueries.defs ++
      operators.ScalarQueries.defs ++
      operators.TemporalQueries.defs ++
      operators.TextQueries.defs ++
      operators.DedupQueries.defs ++
      operators.SimilarityQueries.defs ++
      operators.MultimodalQueries.defs ++
      operators.ExtendedQueries.defs ++
      operators.ExtendedQueries.defs2 ++
      operators.AgreementQueries.defs ++
      operators.CurationQueries.defs ++
      operators.GraphQueries.defs ++
      operators.WarehouseQueries.defs ++
      operators.PipelineQueries.defs): _*)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
