package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization and text-analysis column builders.
  *
  * The tokenizer reproduces the reference's semantics exactly
  * (/root/reference/src/worker.rs:23-34): replace every non-`[A-Za-z]`
  * character with a space, split on whitespace, drop empty tokens.
  * Case-sensitive, ASCII-only — do NOT "improve" to `\p{L}`
  * (SURVEY.md §7.4 traps 2-3).
  */
object Text {
  /** worker.rs:26-27 — `[^A-Za-z]` replaced by a space. */
  val TokenizePattern = "[^A-Za-z]"

  /** Array of non-empty tokens — native single-scan expression; see
    * o.a.s.sql.graft.TokenizeWords. The declarative twin below preserves
    * the formulation the semantics are defined by.
    */
  def tokens(text: Column): Column =
    org.apache.spark.sql.graft.TokenizeWords.tokenize(text)

  /** Unicode-aware tokenizer (NFC + `\p{L}`+ runs) — the multilingual
    * path next to the reference-faithful ASCII [[tokens]]; see
    * [[org.apache.spark.sql.graft.TokenizeUnicode]].
    */
  def unicodeTokens(text: Column): Column =
    org.apache.spark.sql.graft.TokenizeUnicode.tokenizeUnicode(text)

  /** Declarative tokenizer: Spark's `split` keeps empty strings where
    * Rust's `split_whitespace` drops them (SURVEY.md §7.4 trap 1), hence
    * the filter. Equality-tested against [[tokens]].
    */
  def tokensHof(text: Column): Column =
    filter(split(regexp_replace(text, TokenizePattern, " "), "\\s+"), t => t =!= lit(""))

  /** Distinct n-token shingles joined by a single space; empty array when
    * the document has fewer than n tokens. Single-pass native expression;
    * the declarative HOF spelling lives in [[shinglesHof]] and is
    * equality-tested against this.
    */
  def shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.TokenShingles.shingles(toks, n, distinct = true)

  /** HOF formulation of [[shingles]] (reference semantics, interpreted). */
  def shinglesHof(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n), i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** All n-token shingles WITH multiplicity (one per position), for
    * frequency analyses; [[shingles]] deduplicates for set semantics.
    */
  def shinglesAll(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.TokenShingles.shingles(toks, n, distinct = false)

  /** Number of tokens matched by a BPE-ish pre-tokenizer regex: runs of
    * letters, runs of digits, or single non-alphanumeric glyphs.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** English marker stopwords present in any realistic corpus; used by the
    * language-ID heuristic and the quality score.
    */
  val EnglishMarkers: Seq[String] = Seq("the", "a", "and", "of", "is")

  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("long")

  /** Three-way language-ID heuristic over marker-token counts. On a real
    * corpus each language gets its own marker list and an argmax; the test
    * vocabulary is English-only so the classes are confidence tiers.
    */
  def languageId(toks: Column): Column = {
    val ns = markerCount(toks, EnglishMarkers)
    when(ns >= 4, "en").when(ns >= 2, "en_low").otherwise("unknown")
  }
}
