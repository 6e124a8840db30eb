package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline operators:
  * tokenization, shingling, quality signals, language-ID scoring and a
  * deterministic document fingerprint. All pure Catalyst expressions
  * (codegen'd, no UDFs) and all designed for cross-engine bit-parity with
  * the DuckDB oracles: integer arithmetic wherever possible, and double
  * folds always in index order.
  */
object TextFunctions {

  private def bridge = org.apache.spark.sql.graftbridge.ColumnBridge

  /** Lowercased whitespace tokens, empty tokens dropped (so leading /
    * trailing / repeated whitespace cannot skew counts). Native
    * single-pass expression (codegen'd); value-identical to
    * [[tokensComposed]], property-tested in TextVecSpec. */
  def tokens(text: Column): Column =
    bridge.column(graft.expressions.WhitespaceTokens(bridge.expression(text)))

  /** Composed-HOF tokenizer — reference semantics for the property test.
    * An HOF anywhere in a Project drops the operator out of whole-stage
    * codegen, so the catalog queries use the native [[tokens]]. */
  def tokensComposed(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Distinct word n-gram shingles (space-joined) of a raw text column,
    * via the native single-pass [[graft.expressions.WordShingles]]
    * expression (~100x the composed-HOF formulation; same semantics).
    * Returns an empty array for documents shorter than n tokens. */
  def shinglesOfText(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.WordShingles(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), n))

  /** Composed-HOF shingle formulation over a token array — kept as the
    * reference semantics the native expression is property-tested
    * against (ShinglesSpec). */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Jaccard similarity of two pre-distinct shingle arrays: exact integer
    * set sizes divided once — bit-identical across engines. Native
    * one-pass expression (see SetJaccard). */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.expressions.SetJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Composed-builtin jaccard — reference semantics for property tests. */
  def jaccardComposed(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** Count of tokens appearing in a fixed vocabulary. Native codegen'd
    * expression; value-identical to [[vocabHitsComposed]]. */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    bridge.column(graft.expressions.VocabHits(bridge.expression(toks), vocab))

  /** Composed-HOF form — reference semantics for the property test. */
  def vocabHitsComposed(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab.map(x => x: Any): _*)))

  /** Sum of token character-lengths (q29's total_len fold). Native;
    * value-identical to `aggregate(transform(w, length), 0L, _+_)`. */
  def sumTokenLengths(toks: Column): Column =
    bridge.column(graft.expressions.SumTokenLengths(bridge.expression(toks)))

  /** Per-document n-gram repetition stats (n_grams, top_count,
    * dup_grams) in one pass — see [[graft.expressions.RepetitionStats]].
    * The whole Gopher repetition-filter computation without a shuffle. */
  def repetitionStats(text: Column, n: Int): Column =
    bridge.column(graft.expressions.RepetitionStats(bridge.expression(text), n))

  /** Fixed-size token chunks (space-joined, last chunk short) in one
    * pass — see [[graft.expressions.ChunkTokens]]. The document-split
    * step of a pretraining pipeline, without interpreted HOFs. */
  def chunkTokens(text: Column, k: Int): Column =
    bridge.column(graft.expressions.ChunkTokens(bridge.expression(text), k))

  /** Ratio of characters matching a regex class to total characters. */
  def charClassRatio(text: Column, charClassRe: String): Column =
    length(regexp_replace(text, charClassRe, "")).cast("double") /
      length(text).cast("double")

  /** Polynomial rolling-hash fingerprint over the token stream:
    * h := (h*31 + 7*len(t) + ascii(t)) mod 1e9+7. Pure int64 arithmetic,
    * reproducible in any engine (reference analog: the filename/batch
    * identity hashing the spill protocol relies on, but content-derived).
    * Native codegen'd expression; value-identical to
    * [[fingerprintComposed]]. */
  def fingerprint(toks: Column): Column =
    bridge.column(graft.expressions.RollingFingerprint(bridge.expression(toks)))

  /** Composed-HOF form — reference semantics for the property test. */
  def fingerprintComposed(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (h, t) => (h * 31L + length(t).cast("long") * 7L + ascii(t).cast("long")) % 1000000007L)

  /** Per-language stopword vocabularies for the langid heuristic. Tiny on
    * purpose: langid here demonstrates the operator shape (vocabulary
    * scoring + argmax), not a production model. */
  val langVocab: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "un"))
}
