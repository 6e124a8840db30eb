package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface convenience: register every testdata table as a temp view
  * so arbitrary `spark.sql` runs against the same data the query catalog
  * uses. A user of the reference switching to this engine gets a full
  * ANSI SQL surface on top of the DataFrame one.
  */
object Catalog {

  /** Register all tables of a scale-factor directory as temp views
    * (events normalized exactly like Tables.events), plus the engine's
    * native SQL functions (vec_dot, set_jaccard, minhash_signature, ...)
    * so arbitrary SQL has the full surface. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    graft.extensions.GraftExtensions.register(spark)
    Tables.names.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir) else Tables(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
  }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(query)
  }
}
