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
  * second scan) → broadcast-scale doc count N folded in. Everything is
  * map-side-combinable counting; shuffle volume is bounded by the
  * (doc × distinct-term) and term vocabularies, never raw token count.
  *
  * Formula (smoothed, sklearn-style): idf = ln((N + 1)/(df + 1)) + 1,
  * tfidf = tf · idf — mirrored exactly by the DuckDB oracle.
  */
object TextAnalysis {

  /** Per-(doc, term) tf, df, and tfidf for every token. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.where(col(textCol).isNotNull).count()
    tf.join(broadcast(df), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * (log(lit(n + 1.0) / (col("df") + 1.0)) + 1.0), 6).as("tfidf"))
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
