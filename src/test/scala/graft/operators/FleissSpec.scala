package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q240 semantic anchors: the Fleiss algebra refolds exactly from the
  * query's own rater-label frame (BigInt cross-multiplication), and
  * planted frames prove the boundary values — unanimous raters give
  * kappa = 1 exactly. */
class FleissSpec extends SparkSpec {
  import spark.implicits._

  test("q240: kappa_num/kappa_den refold exactly from the label frame") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("n_chars").cast("long").as("nc"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("nt"),
        size(graft.functions.TextFunctions.shinglesOfText(col("text"), 3))
          .cast("long").as("nsh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def terc(v: Long, lo: Long, hi: Long) =
      if (v < lo) 0L else if (v < hi) 1L else 2L
    val raters = docs.map { case (nc, nt1, nsh) =>
      Seq(terc(nc, 220, 385), terc(nt1, 40, 70), terc(nsh, 37, 67)) }
    val n = BigInt(raters.length)
    val a = raters.map { rs =>
      (0L to 2L).map(k => BigInt(rs.count(_ == k))
        * BigInt(rs.count(_ == k))).sum - 3 }.sum
    val ck = (0L to 2L).map(k =>
      k -> BigInt(raters.map(_.count(_ == k)).sum))
    val b = ck.map { case (_, c) => c * c }.sum
    val kn = 3 * n * a - 2 * b
    val kd = 18 * n * n - 2 * b

    val rows = SparkEntry.queries("q240_fleiss_kappa")(spark, sf0001)
      .orderBy("category").collect()
    assert(rows.length == ck.count(_._2 > 0))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == n.toLong)
      assert(r.getAs[Long]("a_num") == a.toLong)
      assert(r.getAs[Long]("b_num") == b.toLong)
      assert(r.getAs[Long]("kappa_num") == kn.toLong)
      assert(r.getAs[Long]("kappa_den") == kd.toLong)
      assert(r.getAs[Long]("c_k")
        == ck.toMap.apply(r.getAs[Long]("category")).toLong)
      // single-shape division parity
      assert(r.getAs[Double]("fleiss_kappa")
        == kn.toLong.toDouble / kd.toLong.toDouble)
    }
    // three length proxies agree far beyond chance on the real corpus
    assert(rows.head.getAs[Double]("fleiss_kappa") > 0.9)
  }

  test("q240: unanimous raters give kappa = 1 exactly") {
    // 90 docs where all three raters agree by construction: short
    // (n_chars 100, 10 tokens, 8 shingles -> all category 0), medium
    // (300 / 50 / 48 -> all 1), long (500 / 90 / 88 -> all 2)
    def words(k: Int) = (1 to k).map(i => s"w$i").mkString(" ")
    val docs = (Seq.fill(30)((100L, words(10)))
      ++ Seq.fill(30)((300L, words(50)))
      ++ Seq.fill(30)((500L, words(90)))).toDF("n_chars", "text")
    val rows = AgreementQueries.fleissKappa(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fleiss_kappa") == 1.0,
        s"unanimous raters must give kappa 1: $r")
      assert(r.getAs[Long]("kappa_num") == r.getAs[Long]("kappa_den"))
    }
  }
}
