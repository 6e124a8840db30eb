package graft.extensions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL function surface must agree with the DSL builders — same
  * expressions underneath, so spot-check each registered function through
  * spark.sql against its DSL twin. */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val sqlSession = {
    val s = SparkSpec.session.newSession()
    GraftExtensions.register(s)
    s
  }

  test("vec_dot / vec_norm / set_jaccard / hamming64 answer SQL correctly") {
    val r = sqlSession.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  vec_norm(array(3.0D, 4.0D)) AS n,
        |  set_jaccard(array('a','b'), array('b','c')) AS j,
        |  hamming64(7L, 1L) AS h""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0 / 3.0) < 1e-15)
    assert(r.getInt(3) == 2) // 7 xor 1 = 6 -> two bits
  }

  test("float arrays are widened exactly like the DSL path") {
    val r = sqlSession.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .collect().head
    assert(r.getDouble(0) == 3.0)
  }

  test("text functions match their DSL twins over the corpus") {
    sqlSession.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("docs")
    val viaSql = sqlSession.sql(
      """SELECT doc_id,
        |  size(whitespace_tokens(text)) AS n_toks,
        |  vocab_hits(whitespace_tokens(text), array('the','and','of','to','a')) AS hits,
        |  sum_token_lengths(whitespace_tokens(text)) AS tl,
        |  rolling_fingerprint(whitespace_tokens(text)) AS fp,
        |  simhash64(whitespace_tokens(text)) AS sh,
        |  size(word_shingles(text, 3)) AS nsh,
        |  size(minhash_signature(word_shingles(text, 3), 16)) AS nsig,
        |  repetition_stats(text, 2) AS rep,
        |  size(chunk_tokens(text, 32)) AS nch
        |FROM docs ORDER BY doc_id LIMIT 50""".stripMargin).collect()
    val w = graft.functions.TextFunctions.tokens(col("text"))
    val viaDsl = graft.Tables.documents(sqlSession, sf0001)
      .select(col("doc_id"),
        size(w).as("n_toks"),
        graft.functions.TextFunctions.vocabHits(w, Seq("the", "and", "of", "to", "a")).as("hits"),
        graft.functions.TextFunctions.sumTokenLengths(w).as("tl"),
        graft.functions.TextFunctions.fingerprint(w).as("fp"),
        graft.functions.HashFunctions.simhash64(w).as("sh"),
        size(graft.functions.TextFunctions.shinglesOfText(col("text"), 3)).as("nsh"),
        size(graft.functions.HashFunctions.minhashSignature(
          graft.functions.TextFunctions.shinglesOfText(col("text"), 3), 16)).as("nsig"),
        graft.functions.TextFunctions.repetitionStats(col("text"), 2).as("rep"),
        size(graft.functions.TextFunctions.chunkTokens(col("text"), 32)).as("nch"))
      .orderBy("doc_id").limit(50).collect()
    assert(viaSql.map(_.toString).toSeq == viaDsl.map(_.toString).toSeq)
  }

  test("graft_hash matches the DSL knuth32 and the local reference") {
    import graft.functions.DeterministicHash
    // Spot ids spanning both CRT limbs' residue ranges, plus the q56 salt.
    val ids = Seq(0L, 1L, 42L, 999983L, 1000003L, 3999999999L, 123456789012L)
    val viaSql = sqlSession.sql(
      s"SELECT graft_hash(id, ${DeterministicHash.sampleSalt}) AS h " +
        s"FROM VALUES ${ids.map(i => s"(${i}L)").mkString(",")} AS t(id) ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    val expected = ids.sorted.map(DeterministicHash.knuth32Local(_, DeterministicHash.sampleSalt))
    assert(viaSql == expected)
    val viaDsl = {
      import sqlSession.implicits._
      ids.toDF("id")
        .select(DeterministicHash.knuth32(col("id"), DeterministicHash.sampleSalt).as("h"))
        .orderBy(col("h")).collect().map(_.getLong(0)).toSeq
    }
    assert(viaDsl == expected.sorted)
  }

  test("nearest_cells works from SQL with a literal centroid table") {
    val r = sqlSession.sql(
      """SELECT nearest_cells(array(0.9D, 0.1D),
        |  array(array(1.0D, 0.0D), array(0.0D, 1.0D), array(-1.0D, 0.0D)), 2) AS c"""
        .stripMargin).collect().head
    assert(r.getSeq[Int](0) == Seq(0, 1))
  }

  test("non-literal where a literal is required fails with a clear error") {
    val e = intercept[Exception] {
      sqlSession.sql("SELECT vocab_hits(array('a'), array(CAST(rand() AS STRING)))").collect()
    }
    assert(e.getMessage.contains("foldable") || e.getMessage.contains("literal"))
  }

  test("empty vocab literal array() means zero hits, not an error") {
    // array() types as ARRAY<NULL>; the element-type guard must keep
    // accepting it (regression: a strict StringType-only match rejected it)
    val r = sqlSession.sql("SELECT vocab_hits(array('a', 'b'), array()) AS h")
      .collect().head
    assert(r.getInt(0) == 0)
  }

  test("wrong element type in a literal array fails with the classified error") {
    // array(1, 2) IS a foldable ArrayType; without the element-type check it
    // would die in getUTF8String with an opaque ClassCastException.
    val e = intercept[Exception] {
      sqlSession.sql("SELECT vocab_hits(array('a'), array(1, 2))").collect()
    }
    assert(e.getMessage.contains("foldable") || e.getMessage.contains("literal"),
      s"expected the classified string-array error, got: ${e.getMessage}")
  }
}
