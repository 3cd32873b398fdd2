package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics (SURVEY §3.2 text row): TF-IDF scoring
  * over the whole document set, all-declarative.
  *
  * Shape: one token explode → per-(doc, term) counts (tf) → per-term
  * document frequency (df) computed from the SAME counted table (no
  * second scan) → doc count N cross-joined in as a one-row aggregate.
  * Everything is map-side-combinable counting; shuffle volume is bounded
  * by the (doc × distinct-term) and term vocabularies, never raw token
  * count.
  *
  * 100 TB notes: the tf⋈df join carries NO broadcast hint — a web-scale
  * vocabulary (typos, numbers, code fragments) is hundreds of millions
  * of terms and would OOM a forced broadcast build; AQE broadcasts it
  * when it measures small and shuffle-joins otherwise. N is a lazy
  * one-row aggregate folded in via crossJoin (a broadcast nested loop of
  * one row), not an eager driver `count()` at plan-construction time.
  *
  * Formula (smoothed, sklearn-style): idf = ln((N + 1)/(df + 1)) + 1,
  * tfidf = tf · idf — mirrored exactly by the DuckDB oracle.
  */
object TextAnalysis {

  /** Per-(doc, term) tf, df, and tfidf for every token. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val present = docs.where(col(textCol).isNotNull)
    val tokens = present
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = present.agg(count(lit(1)).as("__n"))
    tf.join(df, Seq("term"))
      .crossJoin(n)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0), 6).as("tfidf"))
  }

  /** Top-k highest-tfidf terms per document, deterministic
    * (tfidf DESC, term ASC).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tfidf(docs, idCol, textCol)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("tfidf"))
  }
}
