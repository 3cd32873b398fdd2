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

  /** BM25 ranked retrieval: top-k documents per query string, the
    * lexical-search sibling of the embedding top-k (Similarity.scala) —
    * a training pipeline uses it for corpus QA ("which docs dominate
    * this query?") and for building lexical-retrieval eval sets.
    *
    * Scoring (Robertson/Sparck-Jones BM25):
    *   idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))
    *   s(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))
    *
    * Engine-replayability: every INPUT to the formula is an exact
    * integer (tf, df, N, dl, Σdl), the double chain is written with one
    * fixed parenthesization mirrored by the oracle, and each per-term
    * score is truncated to an e6 integer BEFORE the cross-term sum —
    * so the sum is a 64-bit integer add (reduction-order independent)
    * and ranking compares integers, never floats. The only libm call is
    * `ln` (same q36 precedent; both engines evaluate it on identical
    * doubles).
    *
    * Plan / 100 TB shape: one token explode → tf; df and doclen are
    * map-side-combined counts over tf (no second tokenize pass); the
    * query-term table is a literal broadcast; candidate rows are tf
    * FILTERED to query terms BEFORE any join (the scan-side kill — only
    * docs containing a query term survive); the final top-k uses the
    * bounded [[TopKAgg]] aggregate, shipping O(queries × k) pairs
    * through the shuffle instead of sorting every scored doc under a
    * window. No collects; `queries` is caller-literal (bounded, like a
    * search request batch).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "bm25TopK: need at least one query")
    val qt = queries
      .flatMap { case (qid, text) =>
        text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
          .map(term => (qid, term))
      }.toDF("query_id", "term")
    val qTerms = qt.select("term").distinct()

    val present = docs.where(col(textCol).isNotNull)
    val tf = present
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // one-row corpus stats; lazy agg, not a driver count()
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"))
    val tfQ = tf.join(broadcast(qTerms), Seq("term"))
    val df = tfQ.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val idf = log(lit(1.0) +
      (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val quot = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl") / (col("__sumdl").cast("double") / col("__n")))))
    val scored = tfQ
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        floor(idf * quot * lit(1000000.0)).cast("long").as("e6"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("e6")).as("score_e6"))

    scored.groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("score_e6").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("p.id").as("doc_id"), col("p.val").cast("long").as("score_e6"))
  }
}
