package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion (SURVEY §3.3 "similarity search"
  * family, the composition layer): merge the ranked lists of several
  * retrievers — lexical BM25 ([[TextAnalysis.bm25TopK]]), embedding
  * cosine ([[Similarity.bruteForceTopK]]/[[Similarity.lshTopK]]), or
  * any (query_id, doc_id, rnk) table — into one consensus ranking.
  * This is the standard RAG retrieval stack: BM25 catches exact
  * terminology, the embedding side catches paraphrase, and the fusion
  * needs neither side's scores to be calibrated against the other.
  *
  * Scoring is Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR
  * 2009): score(d) = Σ_r 1/(k0 + rank_r(d)), over the rankers that
  * returned d. Computed here as floor-e6 integers —
  * `1_000_000 div (k0 + rnk)` per ranker, summed as 64-bit integer
  * adds — so the fused ordering is a pure integer comparison both
  * engines replay exactly (the q113 e6-before-sum rule: no float ever
  * crosses an aggregation).
  *
  * Plan / 100 TB shape: the inputs are already top-k lists — O(queries
  * × k) rows each, NOT corpus-sized — so the union + one
  * map-side-combined aggregation here is trivially small no matter how
  * big the corpus behind the retrievers is; the final per-query head
  * uses the bounded [[TopKAgg]] (no window over the fused set). The
  * heavy lifting stays inside the retrievers, which carry their own
  * 100 TB postures.
  *
  * @param rankings  (query_id long, doc_id long, rnk long) tables,
  *                  rnk = 1-based position within that retriever;
  *                  rows beyond a retriever's cutoff simply absent
  * @param k0        RRF dampening constant (60 in the paper): higher
  *                  values flatten the head-vs-tail gap
  * @param topK      fused head size per query
  * @return (query_id, fused_rank, doc_id, rrf_e6, n_rankers) —
  *         fused_rank 1-based by (rrf_e6 DESC, doc_id ASC);
  *         n_rankers = how many input lists contained the doc
  */
object Retrieval {

  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60,
              topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k0 >= 1, "rrfFuse: k0 must be >= 1")
    val normed = rankings.map(_.select(
      col("query_id").cast("long"), col("doc_id").cast("long"),
      col("rnk").cast("long")))
    val contrib = normed.reduce(_ unionAll _)
      .where(col("query_id").isNotNull && col("doc_id").isNotNull &&
        col("rnk").isNotNull && col("rnk") >= 1)
      .select(col("query_id"), col("doc_id"),
        expr(s"1000000L div (${k0}L + rnk)").as("e6"))
    val fused = contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("e6")).as("rrf_e6"), count(lit(1)).as("n_rankers"))
    // integer score re-encoded as an exact double for the bounded
    // top-k aggregate (rrf_e6 <= rankers * 1e6/(k0+1) << 2^53); the
    // id ASC tie-break inside TopKAgg matches the oracle's window
    fused
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("rrf_e6").cast("double"), col("doc_id"), topK)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .join(fused.select(col("query_id"), col("doc_id"), col("n_rankers")),
        Seq("query_id"))
      .where(col("p.id") === col("doc_id"))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("fused_rank"),
        col("doc_id"), col("p.val").cast("long").as("rrf_e6"),
        col("n_rankers"))
  }

  /** Retrieval EVALUATION metrics — the harness that closes the loop
    * on the retrieval stack (build → index → search → fuse →
    * MEASURE): per query, recall@k, MRR, and nDCG@k of a ranked list
    * against graded relevance labels.
    *
    * Exactness: recall and MRR are pure integer ratios
    * (`hits·1e6 div n_relevant`, `1e6 div first_rank`); DCG's
    * rel/log₂(rank+1) terms floor to e6 integers BEFORE summation
    * (the q113 rule — the sum is order-independent integer adds and
    * the only libm call is `ln`), IDCG runs the same chain over the
    * ideal ordering (rel DESC, doc ASC), and nDCG is the ppm integer
    * ratio of the two e6 sums.
    *
    * 100 TB shape: rankings are O(queries × k) by construction; the
    * relevance join is query-grain; every aggregation is a
    * map-side-combined per-query sum. Nothing corpus-sized enters.
    *
    * @param rankings  (query_id, doc_id, rnk) — 1-based ranks ≤ k used
    * @param relevance (query_id, doc_id, rel) — graded, rel ≥ 1 means
    *                  relevant; absent pairs are irrelevant
    * @return per query: (query_id, n_relevant, n_retrieved, hits,
    *         recall_ppm, mrr_e6, dcg_e6, idcg_e6, ndcg_ppm)
    */
  def evalMetrics(
      rankings: DataFrame,
      relevance: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1)
    val rel = relevance.select(col("query_id"), col("doc_id"),
        col("rel").cast("long").as("rel"))
      .where(col("rel") >= 1)
    val topk = rankings.where(col("rnk") <= k)
    val joined = topk.join(rel, Seq("query_id", "doc_id"), "left")
    val dcgTerm = floor(col("rel").cast("double") /
      (log(col("rnk").cast("double") + 1.0) / log(lit(2.0))) *
      lit(1000000.0)).cast("long")
    val perQuery = joined.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_retrieved"),
        count(col("rel")).as("hits"),
        min(when(col("rel").isNotNull, col("rnk"))).as("__first"),
        sum(when(col("rel").isNotNull, dcgTerm).otherwise(lit(0L)))
          .as("dcg_e6"))
    // ideal ordering per query: rel DESC, doc ASC, top k
    import org.apache.spark.sql.expressions.Window
    val wIdeal = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val idcg = rel
      .withColumn("__irnk", row_number().over(wIdeal).cast("long"))
      .where(col("__irnk") <= k)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("__nrel_k"),
        sum(floor(col("rel").cast("double") /
          (log(col("__irnk").cast("double") + 1.0) / log(lit(2.0))) *
          lit(1000000.0)).cast("long")).as("idcg_e6"))
    val nRel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_relevant"))
    perQuery
      .join(nRel, Seq("query_id"), "full_outer")
      .join(idcg.drop("__nrel_k"), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        when(col("n_relevant") > 0,
          expr("coalesce(hits, 0L) * 1000000L div n_relevant"))
          .as("recall_ppm"),
        when(col("__first").isNotNull, expr("1000000L div __first"))
          .as("mrr_e6"),
        coalesce(col("dcg_e6"), lit(0L)).as("dcg_e6"),
        coalesce(col("idcg_e6"), lit(0L)).as("idcg_e6"),
        when(col("idcg_e6") > 0,
          expr("coalesce(dcg_e6, 0L) * 1000000L div idcg_e6"))
          .as("ndcg_ppm"))
  }
}
