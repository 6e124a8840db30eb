package graft.tools

/** Codegen audit over the full catalog (SURVEY §9.6): execute each query
  * at sf0.001 (finalizing AQE), then report every physical operator that
  * runs OUTSIDE a WholeStageCodegen span. Codegen'd operators print with
  * a `*(n)` prefix in the executed plan; anything unstarred is
  * interpreted or a non-codegen exec node.
  *
  * Run: sbt "runMain graft.tools.CodegenSweep [sfDir]"
  */
object CodegenSweep {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("graft-codegen-sweep", cores = 8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    // optional second arg: dump one query's raw executed plan
    args.drop(1).headOption.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.collect()
      println("----RAW " + q + "----")
      println(df.queryExecution.executedPlan.toString())
      spark.stop(); return
    }

    val opName = """^[\s:+*\-()0-9]*([A-Za-z][A-Za-z0-9]*)""".r
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        df.collect()
        val all = df.queryExecution.executedPlan.toString().linesIterator.toSeq
        // AQE prints "== Final Plan ==" (starred when codegen'd) AND the
        // unstarred "== Initial Plan ==" — audit only the final one
        val lines = {
          val fin = all.indexWhere(_.contains("== Final Plan =="))
          val ini = all.indexWhere(_.contains("== Initial Plan =="))
          if (fin >= 0 && ini > fin) all.slice(fin + 1, ini) else all
        }
        val outside = lines
          .filter { l =>
            val t = l.dropWhile(c => c == ' ' || c == ':' || c == '+' || c == '-')
            t.nonEmpty && !t.startsWith("*(") && !t.startsWith("(")
          }
          .flatMap(l => opName.findFirstMatchIn(l).map(_.group(1)))
          .filterNot(Set("AdaptiveSparkPlan", "ResultQueryStage", "ShuffleQueryStage",
            "BroadcastQueryStage", "TableCacheQueryStage", "AQEShuffleRead",
            "Exchange", "BroadcastExchange", "ReusedExchange", "InputAdapter",
            "WholeStageCodegen", "Scan", "LocalTableScan", "RowToColumnar",
            "ColumnarToRow", "Subquery", "ReusedSubquery"))
          .distinct
        val nCg = lines.flatMap("""\*\((\d+)\)""".r.findAllMatchIn(_))
          .map(_.group(1)).distinct.size
        println(s"[sweep] $name cg=$nCg outside=${outside.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[sweep] $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
