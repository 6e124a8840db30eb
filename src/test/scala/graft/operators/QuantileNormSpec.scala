package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q246 semantic anchors: the normalized values refold exactly from a
  * sequential quantile mapping, normalization is idempotent-shaped
  * (the pooled multiset of normalized values tracks the pooled raw
  * distribution within per-source granularity), and a planted
  * two-source frame with a known shift proves the alignment — after
  * normalization both sources carry the SAME value multiset. */
class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  test("q246: rows refold exactly from the sequential mapping") {
    val t = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id").cast("long"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = t.length.toLong
    val pooledSorted = t.map(_._3).sorted
    def pooledAt(rank: Long): Long = pooledSorted((rank - 1).toInt)
    val bySource = t.groupBy(_._2)
    val expect = bySource.toSeq.flatMap { case (_, xs) =>
      val ns = xs.length.toLong
      xs.toSeq.sortBy(x => (x._3, x._1)).zipWithIndex.map {
        case (x, i) =>
          val r = i + 1L
          val tr = ((2 * r - 1) * n) / (2 * ns) + 1
          x._1 -> ((x._3, r, ns, tr, pooledAt(tr)))
      }
    }.toMap

    val rows = SparkEntry.queries("q246_quantile_normalization")(
      spark, sf0001).collect()
    assert(rows.length == t.length)
    rows.foreach { r =>
      val (nt, rnk, ns, tr, norm) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("nt") == nt)
      assert(r.getAs[Long]("rnk") == rnk)
      assert(r.getAs[Long]("n_s") == ns)
      assert(r.getAs[Long]("target_rank") == tr)
      assert(r.getAs[Long]("norm_nt") == norm,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("q246: planted shift — two sources align to the same multiset") {
    // srcA docs have 10..29 tokens, srcB the same shape shifted +40
    // (50..69): after normalization both sources must carry the SAME
    // value multiset (the pooled midpoint quantiles), erasing the shift
    def words(k: Int) = (1 to k).map(i => s"w$i").mkString(" ")
    val docs = ((0 until 20).map(i => (i.toLong, "srcA", words(10 + i)))
      ++ (0 until 20).map(i => (100L + i, "srcB", words(50 + i))))
      .toDF("doc_id", "source", "text")
    val out = TextQueries.quantileNormalize(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("norm_nt")))
    val a = out.filter(_._1 == "srcA").map(_._2).sorted.toSeq
    val b = out.filter(_._1 == "srcB").map(_._2).sorted.toSeq
    assert(a == b, s"shift not erased:\n$a\n$b")
    // and the normalized values are drawn from the pooled domain
    assert((a ++ b).forall(v => (v >= 10 && v <= 29) || (v >= 50 && v <= 69)))
  }
}
