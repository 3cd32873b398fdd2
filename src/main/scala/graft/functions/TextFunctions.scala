package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (SURVEY.md §3.3): tokenization, quality scoring, language-ID heuristic,
  * document fingerprinting, shingling.
  *
  * Everything is a pure Catalyst expression (no UDFs) so it stays inside
  * native evaluation, and — deliberately — every function here has a
  * direct DuckDB equivalent so the oracle can replay it
  * (`regexp_split_to_array`/`list_filter`/`md5` on the DuckDB side).
  */
object TextFunctions {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    F.filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: runs of letters, runs of digits, or single
    * other non-space chars — the classic pre-tokenizer regex. Same regex
    * dialect subset works in Java (Spark) and RE2 (DuckDB).
    */
  val BpeRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpeRegex))

  /** Ratio of punctuation/symbol chars to total chars, 4 decimals. */
  def punctRatio(text: Column): Column =
    round(regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(length(text), lit(1)), 4)

  /** Sentence count: runs of sentence-ending punctuation, floored at 1
    * (an unpunctuated document reads as one long sentence — the
    * conservative choice for the readability ratio below).
    */
  def sentenceCount(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1))

  /** Syllable proxy: vowel-group runs (the classic heuristic — each
    * maximal [aeiouy]+ run reads as one syllable nucleus). Exact
    * syllabification needs a dictionary; this proxy is deterministic,
    * SQL-replayable, and monotone enough for corpus-level screening.
    */
  def syllableCount(text: Column): Column =
    regexp_count(text, lit("[AEIOUYaeiouy]+"))

  /** Flesch reading-ease in floor-centipoints:
    * floor((206.835 − 1.015·words/sentences − 84.6·syllables/words)·100).
    * Each input is an exact integer count, the double chain is one
    * fixed parenthesization (engine-identical), and the floor-centi
    * truncation follows the repo float rule. NULL when the text has no
    * words (ratio undefined), never NaN.
    */
  def fleschCenti(text: Column): Column = {
    val w = tokenCount(text).cast("long")
    val s = sentenceCount(text).cast("long")
    val y = syllableCount(text).cast("long")
    when(w > 0, floor(
      (lit(206.835) - lit(1.015) * (w.cast("double") / s)
        - lit(84.6) * (y.cast("double") / w)) * 100).cast("long"))
  }

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(F.filter(tokens(text), t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))

  def stopwordRatio(text: Column): Column =
    round(stopwordCount(text, StopwordsEn).cast("double") /
      greatest(tokenCount(text), lit(1)), 4)

  /** Composite quality score in [0,1]: length credit + stopword credit −
    * punctuation penalty. Deterministic, SQL-expressible; 4 decimals.
    * The final truncation is floor-based floating arithmetic (not
    * `round`): Spark's round goes through BigDecimal HALF_UP while
    * DuckDB's rounds the scaled double, and composite scores land on
    * .xxxx5 boundaries often enough that the two disagree; floor(x*1e4)
    * on the identical double is engine-independent.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val q = lenScore * 0.5 + stopScore * 0.3 + (lit(1.0) - punctRatio(text)) * 0.2
    floor(q * 10000).cast("double") / 10000
  }

  /** Stopword-hit language ID heuristic. Counts (non-distinct) tokens from
    * each language's tiny stopword list; CASE-chain argmax with fixed
    * priority en>es>de>fr on ties; no hits → 'und'.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "un"))

  def langId(text: Column): Column = {
    val t = tokens(text)
    def cnt(ws: Seq[String]) =
      size(F.filter(t, x => x.isin(ws.map(_.asInstanceOf[Any]): _*)))
    val Seq(en, es, de, fr) = LangStopwords.map { case (_, ws) => cnt(ws) }
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Canonical document fingerprint (OpenRefine-style): sorted distinct
    * tokens joined and md5-hashed. Identical in DuckDB:
    * `md5(array_to_string(list_sort(list_distinct(tokens)), ' '))`.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** 3-gram repetition ratio in [0,1]: 1 − distinct-shingles /
    * shingle-windows. The classic "templated/spam text" quality signal —
    * highly repetitive documents (boilerplate, keyword stuffing,
    * degenerate generations) score high. 4 decimals, floor-truncated
    * like [[qualityScore]] for cross-engine determinism.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val windows = greatest(tokenCount(text) - (n - 1), lit(1)).cast("double")
    val distinctShingles = size(shingles(text, n)).cast("double")
    floor((lit(1.0) - distinctShingles / windows) * 10000).cast("double") / 10000
  }

  /** PII patterns for training-data scrubbing. The regex subset is
    * deliberately backreference-free and class-based so the IDENTICAL
    * pattern string runs in both Java regex (Spark) and RE2 (DuckDB) —
    * the oracle replays the scrub exactly. Order matters: emails are
    * redacted before phone numbers so a phone-like digit run inside an
    * address is not double-matched.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "phone" -> "\\+?[0-9][0-9()\\-\\. ]{7,}[0-9]")

  /** Count of PII matches of one pattern kind. */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Text with every PII match replaced by `[<KIND>]`, applied in
    * [[PiiPatterns]] order. Pure Catalyst `regexp_replace` chain —
    * narrow, codegen'd, no UDF; at 100 TB this is a map-only stage.
    */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (kind, pattern)) =>
      regexp_replace(acc, pattern, s"[${kind.toUpperCase}]")
    }

  /** Word n-gram shingles (distinct), for MinHash/Jaccard dedup. For texts
    * shorter than n tokens, the single full-text shingle is used.
    * Delegates to the codegen'd [[Shingles]] expression — semantically
    * identical to the built-in tree
    * `array_distinct(transform(sequence(0, greatest(size(t)-n, 0)),
    * i -> concat_ws(' ', slice(t, i+1, n))))` over [[tokens]], but ~50×
    * faster (the HOF tree is CodegenFallback).
    */
  def shingles(text: Column, n: Int): Column = TextExpressions.shingles(text, n)
}
