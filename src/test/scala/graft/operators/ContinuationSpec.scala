package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q243 semantic anchors: the continuation table refolds exactly from
  * the query's own token stream (multiset trigram counts, two-phase
  * exact election), and a planted frame with a count tie proves the
  * min-token tie-break. */
class ContinuationSpec extends SparkSpec {
  import spark.implicits._

  test("q243: top-50 equals the sequential refold") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .collect().map(_.getSeq[String](0).toVector)
    val c3 = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { w =>
      (0 until w.length - 2).foreach { i =>
        val k = (s"${w(i)} ${w(i + 1)}", w(i + 2))
        c3(k) = c3.getOrElse(k, 0L) + 1L
      }
    }
    val byCtx = c3.groupBy(_._1._1)
    val expect = byCtx.map { case (ctx, m) =>
      val cc = m.values.sum
      val nconts = m.size.toLong
      val cTop = m.values.max
      val top = m.collect { case ((_, w3), c) if c == cTop => w3 }.min
      (ctx, cc, nconts, top, cTop)
    }.toSeq.filter(_._2 >= 5L)
      .sortBy { case (ctx, cc, _, _, _) => (-cc, ctx) }.take(50)

    val rows = SparkEntry.queries("q243_continuation_table")(spark, sf0001)
      .orderBy("rank").collect()
    assert(rows.length == expect.length)
    rows.zip(expect).zipWithIndex.foreach {
      case ((r, (ctx, cc, nconts, top, cTop)), i) =>
        assert(r.getAs[Long]("rank") == i + 1L)
        assert(r.getAs[String]("ctx") == ctx, s"rank ${i + 1}")
        assert(r.getAs[Long]("c_ctx") == cc)
        assert(r.getAs[Long]("n_conts") == nconts)
        assert(r.getAs[String]("top_cont") == top)
        assert(r.getAs[Long]("c_top") == cTop)
        assert(r.getAs[Double]("p_top") == cTop.toDouble / cc.toDouble)
    }
  }

  test("q243: planted count tie elects the lexicographically smallest token") {
    // context "a b" continues to "zz" 3x and "aa" 3x (tie) plus "mm"
    // 1x -> top_cont must be "aa"; support 7 passes the >= 5 cut
    val docs = (Seq.fill(3)("a b zz") ++ Seq.fill(3)("a b aa")
      ++ Seq("a b mm")).map(Tuple1(_)).toDF("text")
    val rows = TextQueries.continuationTable(docs, minSupport = 5L, k = 10)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("ctx") == "a b")
    assert(r.getAs[Long]("c_ctx") == 7L)
    assert(r.getAs[Long]("n_conts") == 3L)
    assert(r.getAs[String]("top_cont") == "aa")
    assert(r.getAs[Long]("c_top") == 3L)
  }
}
