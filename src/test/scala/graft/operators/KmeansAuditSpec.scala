package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q245 semantic anchors: the assignment step refolds exactly from the
  * query's own integer codes (sequential argmin with the same
  * two-phase tie-break), and a planted separable frame proves
  * discriminating power — three tight gaussian-ish blobs with matching
  * labels assign with purity exactly 1 and the planted outlier goes to
  * its nearest seed. */
class KmeansAuditSpec extends SparkSpec {
  import spark.implicits._

  test("q245: cluster rollup equals the sequential refold") {
    val v = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id").cast("long"), col("label").cast("long"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1024) as bigint))"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val seeds = v.groupBy(_._2).map { case (lab, xs) =>
      lab -> xs.minBy(_._1)._3 }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val asg = v.map { case (id, lab, c) =>
      val best = seeds.toSeq
        .map { case (sl, sc) => (d2(c, sc), sl) }.min
      (id, lab, best._2, best._1)
    }
    val expect = asg.groupBy(_._3).map { case (cl, xs) =>
      cl -> (xs.length.toLong, xs.map(_._4).sum,
        xs.count(x => x._2 == cl).toLong)
    }

    val rows = SparkEntry.queries("q245_kmeans_assign_audit")(
      spark, sf0001).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, inertia, m) = expect(r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("n_assigned") == n)
      assert(r.getAs[Long]("inertia") == inertia)
      assert(r.getAs[Long]("n_label_match") == m)
      assert(r.getAs[Double]("purity") == m.toDouble / n.toDouble)
    }
  }

  test("q245: planted separable blobs assign with purity exactly 1") {
    // three blobs at grid offsets 0 / 0.3 / 0.6 on every dim, jitter
    // well below half the blob gap; min vec_id per label is the seed
    val dim = 8
    val rows = for (lab <- 0 to 2; i <- 0 until 20) yield {
      val base = lab * 0.3f
      val emb = Array.tabulate(dim)(j =>
        base + 0.01f * (((i + j) % 5) - 2))
      (lab.toLong * 100L + i, emb.toSeq, lab)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = SimilarityQueries.kmeansAssignAudit(df).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_assigned") == 20L)
      assert(r.getAs[Double]("purity") == 1.0, s"blob leaked: $r")
    }
  }
}
