package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality ratios, language-ID, shingling and hashing.
  *
  * Everything here is built-in Catalyst expressions (split / filter /
  * transform / md5 — all codegen-capable), no UDFs: the hot path over
  * 100 TB of documents stays inside whole-stage codegen, and every
  * function has an exact DuckDB mirror for the oracle.
  *
  * The word hash ([[hash32]]) is the cross-engine anchor: the first 8
  * hex digits of MD5 read as an integer. MD5 is bit-identical
  * everywhere, so MinHash/SimHash built on it verify exactly against
  * the oracle — unlike engine-native hashes (xxhash64 vs DuckDB's).
  */
object TextOps {

  /** Whitespace tokenization of trimmed text (the de-facto standard
    * first pass; BPE-ish subword splitting is [[bpeTokenCount]]).
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** A BPE-ish token estimate: one token per whitespace word plus one
    * per punctuation character (the split real tokenizers approximate).
    * Kept lookaround-free so the RE2-based oracle computes the same.
    */
  def bpeTokenCount(c: Column): Column =
    tokenCount(c) + length(regexp_replace(c, "[A-Za-z0-9\\s]", ""))

  /** Deterministic 32-bit word hash: int of the first 8 MD5 hex chars.
    * DuckDB mirror: `CAST('0x' || substr(md5(w), 1, 8) AS BIGINT)`.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Unicode NFC normalization — the codegen'd
    * [[graft.plans.NfcNormalize]] expression (ASCII rows return the
    * input untouched). The mandatory first step before any byte-keyed
    * text operator (exact dedup, shingles, vocabulary joins) on
    * multilingual corpora; DuckDB mirrors it with `nfc_normalize`.
    */
  def nfc(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.plans.NfcNormalize(bridge.expression(c)))
  }

  /** Word n-grams (shingles) as space-joined strings; empty array when
    * fewer than n tokens. Native codegen'd expression
    * ([[graft.plans.WordNGrams]]) — the higher-order-function
    * formulation ([[wordShinglesHof]]) is CodegenFallback and ~10×
    * slower on the shingle-explode hot path.
    */
  def wordShingles(ws: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.plans.WordNGrams(bridge.expression(ws), n))
  }

  /** Reference formulation via transform/element_at — kept for
    * cross-checking [[wordShingles]] in tests.
    */
  def wordShinglesHof(ws: Column, n: Int): Column = {
    def gram(i: Column): Column =
      concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*)
    when(size(ws) >= n, transform(sequence(lit(1), size(ws) - lit(n - 1)), gram _))
      .otherwise(array())
  }

  /** Share of tokens found in `stop` (quality-scoring signal). */
  def stopwordRatio(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(stop))).cast("double") / size(ws)

  /** Lexical diversity: distinct tokens / tokens. */
  def distinctRatio(ws: Column): Column =
    size(array_distinct(ws)).cast("double") / size(ws)

  /** Non-alphanumeric character share. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") / length(c)

  /** Tiny per-language stopword sets for the n-gram-heuristic
    * language-ID. Order matters: it is the deterministic tie-break.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "is", "of"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  /** Heuristic language-ID: argmax of stopword hit counts, first-listed
    * language wins ties (so "en" for all-zero scores). Exact integer
    * logic → exact oracle parity.
    */
  def langId(ws: Column): Column = {
    val scores = LangStopwords.map { case (lang, stop) =>
      lang -> size(filter(ws, w => w.isInCollection(stop)))
    }
    scores.init.foldRight(lit(scores.last._1): Column) { case ((lang, s), fallback) =>
      val later = scores.dropWhile(_._1 != lang).tail.map(_._2)
      when(later.foldLeft(lit(true): Column)((acc, o) => acc && s >= o), lang).otherwise(fallback)
    }
  }

  /** Rolling-hash document fingerprint (winnowing-lite): the minimum
    * MD5 over all char 8-grams — stable under containerish edits at the
    * ends, cheap to compare. Returns a 32-hex string.
    */
  def charFingerprint(textCol: String, k: Int = 8): Column =
    expr(
      s"array_min(transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)), i -> md5(substring($textCol, i, $k))))"
    )
}
