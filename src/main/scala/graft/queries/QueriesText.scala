package graft

import graft.functions.{Distances, TextFunctions}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query+oracle registrations: one family slice of the [[Queries]]
  * surface (split from the former monolithic Queries.scala; the
  * registry maps stay in [[Queries]]).
  */
private[graft] trait QueriesText { this: Queries.type =>
  // -------------------------------------------------------------------- text
  def textStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        TextFunctions.punctRatio(col("text")).as("punct_ratio"),
        TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** q282: the Gopher quality RULES ([[TextAnalysis.gopherQuality]] —
    * Rae et al. 2021's published heuristic battery) over a lined
    * fixture that exercises every rule: 40 corpus tokens + a bullet
    * line (doc_id ≡ 0 mod 4) + an ellipsis line (mod 5) + a
    * symbol-heavy line (mod 7), so word-count sits astride the 50
    * floor, bullets/ellipses/symbols flip their flags, and the
    * required-stopword count varies with the text. The oracle replays
    * the construction and EVERY rule (integer-div mean word length,
    * non-overlapping symbol counts, trimmed bullet/ellipsis regexes,
    * distinct-stopword intersect, all seven threshold compares and
    * the conjunction) — hash over counts AND booleans.
    */
  def gopherQualityReport(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val lined = t(s, dir, "documents").where(col("text").isNotNull)
      .select(col("doc_id"), concat_ws("\n",
        array_join(slice(toks, 1, 40), " "),
        when(pmod(col("doc_id"), lit(4)) === 0, lit("- bullet item"))
          .otherwise(lit("plain second line")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          lit("to be continued ..."))
          .otherwise(lit("of that have with the end")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit("## ## ## ## ## ## ##"))
          .otherwise(lit("clean tail"))).as("text"))
    TextAnalysis.gopherQuality(lined, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val gopherQualitySql: String = {
    val req = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH tok0 AS (SELECT doc_id, $duckToks AS toks
       |             FROM documents WHERE text IS NOT NULL),
       |lined AS (SELECT doc_id,
       |    COALESCE(array_to_string(toks[1:40], ' '), '') || chr(10) ||
       |    CASE WHEN doc_id % 4 = 0 THEN '- bullet item'
       |         ELSE 'plain second line' END || chr(10) ||
       |    CASE WHEN doc_id % 5 = 0 THEN 'to be continued ...'
       |         ELSE 'of that have with the end' END || chr(10) ||
       |    CASE WHEN doc_id % 7 = 0 THEN '## ## ## ## ## ## ##'
       |         ELSE 'clean tail' END AS text
       |  FROM tok0),
       |m AS (SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      x -> len(x) > 0) AS w,
       |    string_split(text, chr(10)) AS l
       |  FROM lined),
       |c AS (SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(COALESCE(list_sum(list_transform(w, x -> len(x))), 0)
       |      AS BIGINT) AS n_chars,
       |    CAST(len(regexp_extract_all(text, '#'))
       |      + len(regexp_extract_all(text, '\\.\\.\\.'))
       |      + len(regexp_extract_all(text, '…')) AS BIGINT) AS n_symbols,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
       |      AS BIGINT) AS n_alpha_words,
       |    CAST(len(l) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(l, x ->
       |      regexp_matches(trim(x), '^[-*•]'))) AS BIGINT)
       |      AS n_bullet_lines,
       |    CAST(len(list_filter(l, x ->
       |      regexp_matches(trim(x), '(\\.\\.\\.|…)$$'))) AS BIGINT)
       |      AS n_ellipsis_lines,
       |    CAST(len(list_intersect(list_distinct(w), $req)) AS BIGINT)
       |      AS n_req_stopwords
       |  FROM m),
       |f AS (SELECT *,
       |    CASE WHEN n_words > 0 THEN (n_chars * 1000) // n_words END
       |      AS mean_word_len_milli,
       |    (n_words >= 50 AND n_words <= 100000) AS flag_word_count,
       |    (n_symbols * 10 <= n_words) AS flag_symbol_ratio,
       |    (n_alpha_words * 5 >= n_words * 4) AS flag_alpha,
       |    (n_bullet_lines * 10 <= n_lines * 9) AS flag_bullets,
       |    (n_ellipsis_lines * 10 <= n_lines * 3) AS flag_ellipsis,
       |    (n_req_stopwords >= 2) AS flag_stopwords
       |  FROM c)
       |SELECT doc_id, n_words, n_chars, mean_word_len_milli, n_symbols,
       |  n_alpha_words, n_lines, n_bullet_lines, n_ellipsis_lines,
       |  n_req_stopwords, flag_word_count,
       |  COALESCE(mean_word_len_milli >= 3000
       |    AND mean_word_len_milli <= 10000, FALSE) AS flag_word_len,
       |  flag_symbol_ratio, flag_alpha, flag_bullets, flag_ellipsis,
       |  flag_stopwords,
       |  (flag_word_count
       |    AND COALESCE(mean_word_len_milli >= 3000
       |      AND mean_word_len_milli <= 10000, FALSE)
       |    AND flag_symbol_ratio AND flag_alpha AND flag_bullets
       |    AND flag_ellipsis AND flag_stopwords) AS pass
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** punct/stopword ratio expressions over (text, toks) and the quality
    * formula over them — shared by the q21 oracle and the corpus-prep
    * pipeline replay (q58) so the two can never desynchronize from
    * [[TextFunctions.qualityScore]]. */
  private[graft] def punctStopSqlExprs: String = {
    val stop = TextFunctions.StopwordsEn.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) /
       |          greatest(length(text), 1), 4) AS punct_ratio,
       |    round(CAST(len(list_filter(toks, x -> list_contains($stop, x))) AS DOUBLE) /
       |          greatest(len(toks), 1), 4) AS stopword_ratio""".stripMargin
  }

  private[graft] val qualitySqlExpr: String =
    """floor((least(length(text) / 500.0, 1.0) * 0.5 +
      |         least(stopword_ratio * 5.0, 1.0) * 0.3 +
      |         (1.0 - punct_ratio) * 0.2) * 10000) / 10000""".stripMargin

  val textStatsSql: String =
    s"""WITH tok AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
       |m AS (
       |  SELECT doc_id, text, len(toks) AS n_tokens,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
       |    $punctStopSqlExprs
       |  FROM tok)
       |SELECT doc_id, n_tokens, n_bpe_tokens, punct_ratio, stopword_ratio,
       |  $qualitySqlExpr AS quality
       |FROM m ORDER BY doc_id""".stripMargin

  def textLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), TextFunctions.langId(col("text")).as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "lang_guess")

  /** The langId decision CASE over a `toks` list column — shared by the
    * q22 oracle and the corpus-prep pipeline replay (q58). */
  private[graft] def langGuessCaseSql: String = {
    def cnt(ws: Seq[String]) = {
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($lst, x)))"
    }
    val Seq(en, es, de, fr) = TextFunctions.LangStopwords.map { case (_, ws) => cnt(ws) }
    s"""CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr AND $en > 0 THEN 'en'
       |         WHEN $es >= $de AND $es >= $fr AND $es > 0 THEN 'es'
       |         WHEN $de >= $fr AND $de > 0 THEN 'de'
       |         WHEN $fr > 0 THEN 'fr'
       |         ELSE 'und' END""".stripMargin
  }

  val textLangIdSql: String =
    s"""WITH tok AS (SELECT doc_id, lang, $duckToks AS toks FROM documents),
       |g AS (
       |  SELECT lang,
       |    $langGuessCaseSql AS lang_guess
       |  FROM tok)
       |SELECT lang, lang_guess, COUNT(*) AS cnt FROM g
       |GROUP BY lang, lang_guess ORDER BY lang, lang_guess""".stripMargin

  /** Top-5 TF-IDF terms per document (corpus-level text analysis). The
    * idf's natural log is computed in double on both engines; ties break
    * (tfidf DESC, term ASC).
    */
  def tfidfTop(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topTerms(t(s, dir, "documents"), "doc_id", "text", 5)
      .orderBy("doc_id", "rnk")

  val tfidfTopSql: String = {
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($duckToks) AS term
       |  FROM documents WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT COUNT(*) AS n FROM documents WHERE text IS NOT NULL),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf,
       |    round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, term, tf, tfidf,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY tfidf DESC, term ASC) AS rnk
       |  FROM scored)
       |SELECT doc_id, rnk, term, tf, tfidf FROM ranked
       |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin
  }

  /** Range join over the event stream: views in the 5 minutes before
    * each click, per user — on the microsecond-truncated timeline (see
    * [[asofClickView]]).
    */
  def rangeJoinViews(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").withColumn("ts", expr("ts div 1000"))
    RangeJoin.countInWindow(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "view"),
        "user_id", "ts", "event_id", windowSize = 5L * 60 * 1000 * 1000)
      .select(col("left_id").as("click_id"), col("cnt").as("views_5min"))
      .orderBy("click_id")
  }

  val rangeJoinViewsSql: String =
    """SELECT c.event_id AS click_id,
      |  (SELECT COUNT(*) FROM events v
      |   WHERE v.user_id = c.user_id AND v.event_type = 'view'
      |     AND (epoch_ns(v.ts) // 1000) > (epoch_ns(c.ts) // 1000) - 300000000
      |     AND (epoch_ns(v.ts) // 1000) <= (epoch_ns(c.ts) // 1000)) AS views_5min
      |FROM events c WHERE c.event_type = 'click' ORDER BY click_id""".stripMargin
}
