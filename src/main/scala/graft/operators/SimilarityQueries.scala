package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (vec_id, ARRAY<FLOAT> x64,
  * label): cosine near-dup pairs, exact brute-force top-k ANN baseline,
  * and the LSH-bucketed approximate variant (the 100 TB path: candidates
  * from an equi-join on sign-bit buckets, corpus never cross-joined).
  *
  * Oracle parity: all reductions are index-ordered left folds (see
  * VectorFunctions) mirrored by DuckDB list_reduce/list_transform, so
  * cosines match bit-for-bit with no tolerance.
  */
object SimilarityQueries {

  // DuckDB: vector as DOUBLE list + its norm, fold order matching Spark's.
  private val sqlNormed =
    """WITH c AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm
      |FROM c)""".stripMargin
  private val sqlDot =
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i]*b.v[i])), (x,y) -> x+y)"

  private def normed(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm2(col("v")))

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- q37
    "q37_embed_neardup_pairs" -> QueryDef.sql(
      "Embedding near-duplicate pairs: cosine >= 0.35 among vec_id<300. " +
      "Exact pairwise ground truth (bounded slice); the scale path is the " +
      "LSH bucketing of q39.",
      s"""$sqlNormed
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  $sqlDot / (a.nrm * b.nrm) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 300 AND b.vec_id < 300
        |  AND $sqlDot / (a.nrm * b.nrm) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
      val base = normed(s, d).where(col("vec_id") < 300)
      val a = base.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
        .where(col("cos") >= 0.35)
        .orderBy("vec_a", "vec_b")
    },

    // ---------------------------------------------------------------- q38
    "q38_ann_bruteforce_topk" -> QueryDef.sql(
      "Exact top-5 nearest neighbors by cosine for 10 query vectors " +
      "against the full corpus: broadcast the tiny query side, scan the " +
      "corpus once, per-query heap via ranking window.",
      s"""$sqlNormed,
        |q AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < 10),
        |sc AS (SELECT a.vec_id AS qid, b.vec_id AS vid,
        |         $sqlDot / (a.nrm * b.nrm) AS cos
        |       FROM q a JOIN n b ON a.vec_id != b.vec_id)
        |SELECT qid, vid, cos, rnk FROM (
        |  SELECT qid, vid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid)::BIGINT AS rnk
        |  FROM sc) t
        |WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val corpus = normed(s, d)
      val queries = corpus.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val scored = corpus.join(broadcast(queries), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q39
    "q39_ann_lsh_bucketed" -> QueryDef.rowsOnly(
      "Approximate NN via multi-probe random-hyperplane LSH (8 planes, " +
      "seed 42): corpus gets an 8-bit sign code; each query probes its " +
      "own bucket plus all 8 one-bit-flip neighbors (the buckets a " +
      "borderline hyperplane decision could have placed a true neighbor " +
      "in). Candidates still come from an equi-join on the code — " +
      "hash-partitionable at any scale — then exact cosine re-ranks. " +
      "Engine-specific layout -> rows-only check; recall covered by " +
      "SimilaritySpec against q38's exact answer.") { (s, d) =>
      val planes = makePlanes(8, 64)
      val coded = normed(s, d).withColumn("code", hyperplaneCode(col("v"), planes))
      val probeCodes = array(
        col("qcode0") +: (0 until planes.length).map(j =>
          col("qcode0").bitwiseXOR(lit(1L << j))): _*)
      val queries = coded.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"), col("code").as("qcode0"))
        .withColumn("qcode", explode(probeCodes))
        .drop("qcode0")
      val cand = coded.join(queries,
          col("qcode") === col("code") && col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
        .distinct()
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
      cand.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q47
    "q47_ann_ivf" -> QueryDef.rowsOnly(
      "IVF-style ANN: deterministic coarse centroids (every 31st corpus " +
      "vector, so the cell count grows ~linearly with the corpus like a " +
      "real IVF index), corpus assigned to its nearest cell via a " +
      "broadcast centroid join, queries probe their top-2 cells, exact " +
      "cosine re-ranks cell members. Fully lazy plan (no driver-side " +
      "action). Deterministic but engine-specific layout -> rows-only; " +
      "recall covered by SimilaritySpec vs the exact q38 baseline.") { (s, d) =>
      val corpus = normed(s, d)
      // deterministic, lazily-derived coarse centroids: stride sampling
      // keeps cells ∝ corpus size without a count() action at plan build
      val cents = corpus.where(col("vec_id") % 31 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      // nearest-cell assignment (rank over the 16-way broadcast product)
      val scored = corpus.join(broadcast(cents), lit(true))
        .withColumn("csim", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
      val assigned = scored.withColumn("r", row_number().over(wAssign))
        .where(col("r") === 1)
        .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
      // queries probe their top-2 cells
      val qProbe = corpus.where(col("vec_id") < 10)
        .join(broadcast(cents), lit(true))
        .withColumn("csim", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
      val probes = qProbe.withColumn("r", row_number().over(wProbe))
        .where(col("r") <= 2)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"), col("cid").as("cell"))
      // search only the probed cells (equi-join on cell id)
      val cand = assigned.join(probes, Seq("cell"))
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
      cand.withColumn("rnk", row_number().over(wTop).cast("long"))
        .where(col("rnk") <= 5)
        .orderBy("qid", "rnk")
    }
  )
}
