package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
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
               k1: Double = 1.2, b: Double = 0.75,
               maxScorePrune: Boolean = false): DataFrame =
    bm25TopKIndexed(textIndex(docs, idCol, textCol), queries, k, k1, b,
      maxScorePrune)

  /** The lexical inverted index behind [[bm25TopK]], split out so it
    * can be built ONCE and persisted
    * ([[graft.operators.IndexStore.saveTextIndex]]): `postings` =
    * (doc_id, term, tf) — the per-document term-frequency table — and
    * `doclen` = (doc_id, dl). Corpus stats (N, Σdl) are deliberately
    * NOT part of the state: they are one-row lazy aggregates of
    * `doclen` derived at probe time, which is what makes append ≡
    * rebuild a pure table union (no stored stat can go stale).
    * Documents that tokenize to nothing carry no rows (and so don't
    * count toward N) — the empty document participates in no lexical
    * score either way.
    */
  final case class TextIndex(postings: DataFrame, doclen: DataFrame)

  /** One tokenize pass → postings + doc lengths (df/N/Σdl all derive
    * from these without re-tokenizing).
    */
  def textIndex(docs: DataFrame, idCol: String, textCol: String): TextIndex = {
    val present = docs.where(col(textCol).isNotNull)
    val tf = present
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    TextIndex(tf, tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
  }

  /** [[bm25TopK]] against a prebuilt (usually loaded) [[TextIndex]] —
    * the probe side of the persist-once/probe-forever lifecycle. Same
    * plan shape and engine-replayability contract as [[bm25TopK]]'s
    * scaladoc; the only difference is that the tokenize+count stages
    * are replaced by the index relations.
    *
    * `maxScorePrune` (off by default) is the RANKED sibling of the
    * threshold screens' lossless MaxScore cut — classic WAND/MaxScore
    * adapted to a two-pass batch plan, because a top-k query has no
    * fixed threshold to prune against until some scores are known:
    * pass 1 scores a cheap per-query SEED candidate set exactly (the
    * docs behind each query's rarest matched terms — see
    * [[topKCandidateDocs]]) and takes the running k-th seed score as
    * that query's adaptive threshold θ_q (a LOWER bound on the true
    * k-th score: every seed score is an exact score of a real doc);
    * pass 2 reuses the q268 ub machinery per query — a query's
    * ascending-ub prefix whose ub-sum stays under θ_q is
    * non-essential, only docs carrying an essential term are scored.
    * LOSSLESS by the same argument as the screens: every doc with
    * score ≥ θ_q is scored exactly, the true top-k all score
    * ≥ k-th ≥ θ_q, and ties at the boundary compare identical e6
    * integers under the same (score DESC, doc ASC) order — the output
    * is bit-identical to the unpruned form (hash-proven by q272's
    * unpruned oracle and TextAnalysisSpec). The win is the same
    * volume law as q268: stopword-class terms (ub ≈ 0) leave the
    * multiply entirely once θ_q > 0, so a retrieval user stops paying
    * Σ_t |postings(t)|·|queries(t)| over postings that decide nothing.
    * Cost when it cannot help (θ_q = 0 — fewer than k seed matches):
    * two extra scan-shaped passes, then the exact unpruned volume.
    */
  def bm25TopKIndexed(index: TextIndex, queries: Seq[(Long, String)], k: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      maxScorePrune: Boolean = false): DataFrame = {
    require(queries.nonEmpty, "bm25TopKIndexed: need at least one query")
    val qt = queryTerms(index, queries)
    // NOTE (measured round 14): materializing the matched-postings
    // relation once (localCheckpoint) and substituting it for the
    // postings table collapses the pruned plan's 13 parquet scans to 0
    // — and is WALL-NEUTRAL at the 2M-doc/40M-posting probe (17.1 s vs
    // 16.4–18.9 s): Spark's ReusedExchange already absorbs the scan
    // redundancy, while the checkpoint adds executor-storage cost that
    // scales with matched postings. Deliberately NOT done — the lazy
    // plan keeps the pruned form declarative and storage-elastic.
    val scored =
      if (!maxScorePrune) bm25ScoredIndexed(index, qt, k1, b)
      else bm25ScoredIndexed(index, qt, k1, b,
        candidateDocs = Some(topKCandidateDocs(index, qt, k, k1, b)))
    rankTopK(scored, k)
  }

  /** The ranked forms' shared tail: per-query bounded top-k over the
    * scored pairs via [[TopKAgg]] — O(queries × k) pairs through the
    * shuffle, never a full sort of every scored doc under a window.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("score_e6").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("p.id").as("doc_id"), col("p.val").cast("long").as("score_e6"))

  /** [[bm25TopKIndexed]] over a DATA-SIZED query RELATION — the
    * retrieval shape at corpus scale, where "queries" are not a search
    * request batch but a table in their own right: millions of eval
    * prompts decontamination-ranked against the corpus, hard-negative
    * mining at training-set grain, every-doc-as-its-own-query corpus
    * QA. Scoring, ranking, and the lossless `maxScorePrune` are the
    * driver-literal form's OWN machinery (the scoring core and the
    * seed/θ two-pass already operate on a (query_id, term) DataFrame)
    * — the only differences are the query side's derivation (column
    * expressions over `queries`: lowercase whitespace tokens,
    * per-query distinct — exactly the tokenization every BM25 form
    * shares) and the hint discipline: NO broadcast hints anywhere on
    * query-derived relations (the [[graft.operators.IndexStore.ingestText]]
    * posture — a forced broadcast of an unbounded query vocabulary
    * would OOM the build side; AQE broadcasts what it measures small
    * and shuffle-joins the rest). Ranking ties and e6 integer scores
    * are identical to [[bm25TopKIndexed]] — the two forms agree
    * bit-for-bit on the same query set (TextAnalysisSpec).
    *
    * `maxScorePrune` semantics (round 16 — verdict-15 ask #1): `None`
    * (the default) decides AUTOMATICALLY from one cheap pre-flight
    * aggregate over the qt ⋈ df relation ([[topKPruneStats]] /
    * [[autoPruneDecision]]) — the measured round-15 decision rule
    * ("prune pays when the query relation leaves most of the corpus
    * un-seeded; it costs ~3× when every family is seeded") is now the
    * engine's own default instead of a scaladoc footnote a 100 TB user
    * must read. `Some(true)` / `Some(false)` force a side (the
    * registered q275 keeps `Some(true)` so the pruned path stays
    * hash-proven against the unpruned oracle). The measured law behind
    * the rule (round 15, both at 2M docs): a 100-query relation vs a
    * stopword-dominated corpus runs the pruned path in 37 s where the
    * raw multiply would be 2·10⁹ pairs (prune WINS ≥5×); a 100k-query
    * relation spanning every family of a selective corpus makes every
    * doc some query's seed doc, the candidate set degrades to the
    * whole matched corpus, and the two extra passes re-scan the same
    * volume (12.6 s unpruned → 35.8 s pruned — prune LOSES ~3×). The
    * auto mode is EAGER: it runs one scan-shaped aggregate job (a
    * postings ⋈ query-terms scan, a term-grain df count, a qt-grain
    * window, a 1-row collect) at plan-construction time. That scan IS
    * re-paid by the chosen plan (separate Spark jobs cannot share a
    * ReusedExchange), deliberately: the r14 scan-collapse experiment
    * measured checkpoint-threading of exactly these relations as
    * wall-neutral at the 2M-doc probe while adding executor-storage
    * cost, and the r16 probe measured the whole pre-flight at ≈ noise
    * on both decision shapes (47.4 s auto-pruned vs 37.4 s
    * forced-pruned on a 1.27× hotter box; 20.3 s auto-direct vs
    * 12.6 s forced-direct on a 1.6× hotter box) — ~1000× cheaper
    * than the mis-decision it prevents (SCALING §r16 probe rows).
    */
  /** A query RELATION → (query_id, term) rows — the relation-side twin
    * of [[queryTerms]] (same tokenization: lowercase whitespace split,
    * per-query distinct; null texts emit nothing), shared by
    * [[bm25TopKJoin]], [[bm25ScreenJoin]] and (at `doc_id` grain)
    * [[graft.operators.IndexStore.ingestText]].
    */
  private[graft] def queryTermsOf(queries: DataFrame, queryIdCol: String,
                                  queryTextCol: String): DataFrame =
    queries.where(col(queryTextCol).isNotNull)
      .select(col(queryIdCol).cast("long").as("query_id"),
        explode(array_distinct(TextFunctions.tokens(col(queryTextCol))))
          .as("term"))

  def bm25TopKJoin(index: TextIndex, queries: DataFrame,
                   queryIdCol: String, queryTextCol: String, k: Int,
                   k1: Double = 1.2, b: Double = 0.75,
                   maxScorePrune: Option[Boolean] = None): DataFrame = {
    val qt = queryTermsOf(queries, queryIdCol, queryTextCol)
    val prune = maxScorePrune.getOrElse {
      val (seedVol, totVol, n) = topKPruneStats(index, qt, k, k1)
      autoPruneDecision(seedVol, totVol, n)
    }
    val scored =
      if (!prune)
        bm25ScoredIndexed(index, qt, k1, b, broadcastQueries = false)
      else bm25ScoredIndexed(index, qt, k1, b, broadcastQueries = false,
        candidateDocs = Some(topKCandidateDocs(index, qt, k, k1, b,
          broadcastQueries = false)))
    rankTopK(scored, k)
  }

  /** BM25 THRESHOLD screen against a prebuilt index — every
    * (query, doc) with score_e6 ≥ `minScoreE6`, no ranking: the
    * lexical member of the threshold-screen family
    * ([[Dedup.hammingJoinIndexed]] perceptual,
    * [[Similarity.cosineJoinIndexed]] semantic) and the batch twin of
    * [[graft.streaming.StreamOps.searchGate]]. The use case is
    * lexical DECONTAMINATION at query grain: flag every corpus doc
    * suspiciously close to an eval prompt, where top-k would truncate
    * exactly the long tail one needs to see. Scoring is
    * [[bm25TopKIndexed]]'s own chain (shared, not copied).
    */
  def bm25ScreenIndexed(index: TextIndex, queries: Seq[(Long, String)],
                        minScoreE6: Long,
                        k1: Double = 1.2, b: Double = 0.75,
                        maxDfPpm: Option[Long] = None,
                        maxScorePrune: Boolean = false): DataFrame = {
    require(queries.nonEmpty, "bm25ScreenIndexed: need at least one query")
    bm25ScoredIndexed(index, queryTerms(index, queries), k1, b,
        maxDfPpm = maxDfPpm,
        pruneThresholdE6 = if (maxScorePrune) Some(minScoreE6) else None)
      .where(col("score_e6") >= minScoreE6)
  }

  /** [[bm25ScreenIndexed]] over a DATA-SIZED query RELATION — the
    * threshold-screen sibling of [[bm25TopKJoin]], closing the last
    * driver-literal asymmetry in the indexed-screen family
    * ([[Dedup.hammingJoinIndexed]] and [[Similarity.cosineJoinIndexed]]
    * already take DataFrames; the lexical member did not). The use
    * case at corpus scale: decontamination at EVAL-SET grain — every
    * (prompt, corpus doc) pair at score_e6 ≥ `minScoreE6` where the
    * prompts are a table of thousands, un-ranked (top-k would truncate
    * exactly the tail a contamination audit exists to surface).
    * Scoring, `maxDfPpm`, and the lossless threshold MaxScore prune
    * are [[bm25ScoredIndexed]]'s own machinery; the query side is
    * derived with the shared tokenization and carries NO broadcast
    * hints (the [[bm25TopKJoin]] posture — AQE decides). Screens with
    * the prune ON pass one per-query literal threshold, so the prune
    * stays lossless at relation grain (TextAnalysisSpec pins join ≡
    * literal, pruned and unpruned).
    *
    * `maxScorePrune = None` (the default) AUTO-decides from the same
    * pre-flight statistic family as [[bm25TopKJoin]]'s auto mode,
    * with the threshold form's own focus set: the ESSENTIAL postings
    * volume ([[screenPruneStats]] — Σ df over the (query, term) rows
    * whose ascending-ub cumulative sum reaches `minScoreE6`). When
    * essentially every matched term is essential (low thresholds, or
    * the r15bm mid-df shape where the global ub cannot separate), the
    * candidate cut is provably empty and auto keeps the direct
    * multiply; when the essential set is a small slice (high
    * decontamination-grade thresholds over stopword-heavy corpora)
    * auto prunes. `Some(b)` forces a side (q277 keeps `Some(true)` —
    * the pruned path stays hash-proven).
    */
  def bm25ScreenJoin(index: TextIndex, queries: DataFrame,
                     queryIdCol: String, queryTextCol: String,
                     minScoreE6: Long,
                     k1: Double = 1.2, b: Double = 0.75,
                     maxDfPpm: Option[Long] = None,
                     maxScorePrune: Option[Boolean] = None): DataFrame = {
    val qt = queryTermsOf(queries, queryIdCol, queryTextCol)
    val prune = maxScorePrune.getOrElse {
      val (essVol, totVol, n) =
        screenPruneStats(index, qt, minScoreE6, k1, maxDfPpm)
      autoPruneDecision(essVol, totVol, n)
    }
    bm25ScoredIndexed(index, qt, k1, b, broadcastQueries = false,
        maxDfPpm = maxDfPpm,
        pruneThresholdE6 = if (prune) Some(minScoreE6) else None)
      .where(col("score_e6") >= minScoreE6)
  }

  /** Driver-literal query batch → (query_id, term) rows (lowercased
    * whitespace tokens, per-query distinct) — the query-side
    * tokenization every BM25 form shares; the streaming gate replays
    * it as column expressions (split/lower/filter/array_distinct) over
    * the live stream.
    */
  private def queryTerms(
      index: TextIndex, queries: Seq[(Long, String)]): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    queries.flatMap { case (qid, text) =>
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
        .map(term => (qid, term))
    }.toDF("query_id", "term")
  }

  /** The shared scoring core: per-(query, doc) e6 score sums over a
    * (query_id, term) table. The scan-side kill (postings filtered to
    * query terms before any other join) is what keeps this index-grain
    * at 100 TB. With `broadcastQueries` on (the default — the
    * driver-literal search-request shape of [[bm25TopKIndexed]] /
    * [[bm25ScreenIndexed]]) the query-term, query and df sides carry
    * broadcast hints; off (the data-sized query side of
    * [[graft.operators.IndexStore.ingestText]], where "queries" are a
    * whole ingest batch's documents) no hint is given and AQE picks the
    * join strategy from measured sizes — a forced broadcast of an
    * unbounded batch vocabulary would OOM the build side. The one-row
    * stats fold stays broadcast either way.
    *
    * `maxDfPpm` (off by default — scores then match the classic form
    * exactly) PRUNES ultra-common query terms before scoring: a term
    * whose document frequency exceeds maxDfPpm parts-per-million of
    * the corpus (integer rule df · 1e6 > ppm · N, replayed exactly by
    * the DuckDB oracles) is dropped from every score sum. This is the
    * principled fix for exact BM25's worst scale law: a stopword-class
    * term (df ≈ N) contributes idf ≈ ln(1 + 0.5/(N+0.5)) ≈ 0 to every
    * score yet multiplies the scored volume by its ENTIRE postings
    * list — at web scale the screen's Σ_t |postings(t)|·|queries(t)|
    * is dominated by exactly the terms that decide nothing. The prune
    * is applied via the df relation BEFORE the query join, so the
    * volume never materializes; scores change only by the near-zero
    * terms removed, and deterministically (the rule is integer-exact
    * on both engines).
    */
  /** The relation-grain auto-prune decision (verdict-15 ask #1),
    * shared by [[bm25TopKJoin]] and [[bm25ScreenJoin]]: given the
    * prune's FOCUS volume (seed-prefix postings for the ranked form,
    * essential postings for the threshold form), the total matched
    * volume Σ_{(q,t) ∈ qt⋈df} df(t), and the corpus size N, prune iff
    *
    *   focusVol ≤ N/2      (the focus set cannot blanket the corpus —
    *                        when every doc is some query's seed/
    *                        essential doc, the candidate set degrades
    *                        to the whole matched corpus and the extra
    *                        passes re-scan the same volume: the
    *                        measured 12.6 → 35.8 s r15 failure mode)
    *   totVol ≥ 4·focusVol (there is real mass to cut — the pruned
    *                        plan pays ~3 scan-shaped passes over the
    *                        focus/candidate volume, so a corpus whose
    *                        matched volume is mostly focus volume has
    *                        nothing for θ/essential cuts to remove)
    *
    * Margins are measured, not tuned: the round-15/16 probe shapes
    * sit ≥ 10× from each boundary on their deciding condition
    * (selective 100-query shape: focusVol/N ≈ 5·10⁻³,
    * totVol/focusVol ≈ 2·10⁵ → prune; exhaustive 100k-query shape:
    * focusVol/N ≈ 5 → direct; SCALING §r16). Degenerate inputs
    * (empty queries, empty index, nothing matched) decide `false` —
    * the prune can't help when there is nothing to cut.
    */
  private[graft] def autoPruneDecision(
      focusVol: Long, totVol: Long, n: Long): Boolean =
    totVol > 0L && n > 0L &&
      focusVol.toDouble * 2.0 <= n.toDouble &&
      totVol.toDouble >= 4.0 * focusVol.toDouble

  /** The (stats, tfQ0, df) relation trio every prune-side consumer
    * derives — the one-row corpus stats, postings ⋈ distinct query
    * terms (the scan-side kill), and term-grain df with the optional
    * `maxDfPpm` cut applied BEFORE anything multiplies. ONE
    * construction (round-16 review consolidation) shared by the
    * scoring core, the guardrail candidates, and both pre-flight
    * statistics, so the statistic can never silently measure a
    * different volume than the screen it decides for. `hint` is the
    * caller's broadcast discipline (literal forms broadcast, relation
    * forms leave every join to AQE).
    */
  private def qtRelations(
      index: TextIndex, qt: DataFrame, maxDfPpm: Option[Long],
      hint: DataFrame => DataFrame)
    : (DataFrame, DataFrame, DataFrame) = {
    val stats = index.doclen
      .agg(count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"))
    val tfQ0 = index.postings
      .join(hint(qt.select("term").distinct()), Seq("term"))
    val dfAll = tfQ0.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val df = maxDfPpm.fold(dfAll) { ppm =>
      dfAll.crossJoin(broadcast(stats.select(col("__n"))))
        .where(col("df") * lit(1000000L) <= lit(ppm) * col("__n"))
        .drop("__n")
    }
    (stats, tfQ0, df)
  }

  /** [[autoPruneDecision]]'s inputs for the RANKED form:
    * (seedVol, totVol, N) from one aggregate over qt ⋈ df — seedVol is
    * Σ df over each query's seed prefix (ub DESCENDING, exclusive
    * cumulative df < k: exactly [[topKCandidateDocs]]'s seed rule, so
    * the statistic measures the very prefix the prune would score).
    * Cost: the postings ⋈ query-terms scan (which the scoring path
    * pays anyway), one term-grain count, one qt-grain window, a 1-row
    * collect. Hint-free throughout (the join forms' posture).
    */
  private[graft] def topKPruneStats(
      index: TextIndex, qt: DataFrame, k: Int,
      k1: Double): (Long, Long, Long) = {
    val (stats, _, df) = qtRelations(index, qt, None, identity)
    val wSeed = Window.partitionBy(col("query_id"))
      .orderBy(col("__ub").desc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = qt
      .join(maxScoreUb(df, stats, k1).join(df, Seq("term")), Seq("term"))
      .withColumn("__cum", sum(col("df")).over(wSeed))
      .crossJoin(broadcast(stats.select(col("__n"))))
      .agg(
        sum(when(col("__cum") - col("df") < k, col("df"))
          .otherwise(lit(0L))).as("__seedVol"),
        sum(col("df")).as("__totVol"),
        max(col("__n")).as("__nn"))
      .head()
    if (r.isNullAt(1)) (0L, 0L, 0L)
    else (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** [[autoPruneDecision]]'s inputs for the THRESHOLD form:
    * (essVol, totVol, N) — essVol is Σ df over the ESSENTIAL
    * (query, term) rows (ascending-ub cumulative sum ≥ `thr`: exactly
    * [[maxScoreCandidateDocsPerQuery]]'s essential rule at a fixed
    * per-query threshold), after the same `maxDfPpm` term cut the
    * screen itself would apply. Same single-aggregate cost shape as
    * [[topKPruneStats]].
    */
  private[graft] def screenPruneStats(
      index: TextIndex, qt: DataFrame, thr: Long, k1: Double,
      maxDfPpm: Option[Long]): (Long, Long, Long) = {
    val (stats, _, df) = qtRelations(index, qt, maxDfPpm, identity)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__ub").asc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = qt
      .join(maxScoreUb(df, stats, k1).join(df, Seq("term")), Seq("term"))
      .withColumn("__cum", sum(col("__ub")).over(w))
      .crossJoin(broadcast(stats.select(col("__n"))))
      .agg(
        sum(when(col("__cum") >= lit(thr), col("df"))
          .otherwise(lit(0L))).as("__essVol"),
        sum(col("df")).as("__totVol"),
        max(col("__n")).as("__nn"))
      .head()
    if (r.isNullAt(1)) (0L, 0L, 0L)
    else (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The MaxScore prune's candidate set: docs carrying at least one
    * ESSENTIAL term for some query (see [[bm25ScoredIndexed]]'s prune
    * scaladoc for the ub/prefix argument). Split out so
    * [[graft.operators.IndexStore.ingestText]] can materialize it ONCE
    * and share it between its guardrail estimate (which, with the
    * prune on, budgets the TRUE candidate-restricted volume) and the
    * screen itself via `candidateDocs`.
    */
  private[graft] def maxScoreCandidateDocs(
      tfQ0: DataFrame, qt: DataFrame, df: DataFrame, stats: DataFrame,
      k1: Double, thr: Long,
      hint: DataFrame => DataFrame): DataFrame =
    maxScoreCandidateDocsPerQuery(tfQ0, qt, df, stats, k1,
      qt.select(col("query_id")).distinct().withColumn("__thr", lit(thr)),
      hint)

  /** Per-term score upper bound ub = ⌊idf·(k1+1)·1e6⌋ (the
    * tf-saturation quotient is < k1+1 for any tf/dl, and the per-term
    * e6 floor is monotone under it) — the relation both MaxScore
    * prunes reason over.
    */
  private def maxScoreUb(
      df: DataFrame, stats: DataFrame, k1: Double): DataFrame =
    df.crossJoin(broadcast(stats.select(col("__n"))))
      .select(col("term"),
        floor(log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) * lit((k1 + 1.0) * 1000000.0))
          .cast("long").as("__ub"))

  /** The MaxScore essential-prefix candidate set with a PER-QUERY
    * threshold relation `thrs` (query_id, __thr) — the top-k form's
    * adaptive thresholds ride through here; the fixed-threshold
    * screens pass one literal per query. A query missing from `thrs`
    * coalesces to 0 (cum ≥ 0 always holds, so every matched term
    * stays essential — the prune degrades to a no-op, never to a
    * dropped doc). Candidates are a UNION over queries (a doc
    * essential for any query is scored for all it matches) — a
    * superset, so still lossless.
    */
  private[graft] def maxScoreCandidateDocsPerQuery(
      tfQ0: DataFrame, qt: DataFrame, df: DataFrame, stats: DataFrame,
      k1: Double, thrs: DataFrame,
      hint: DataFrame => DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__ub").asc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val essentialTerms = qt.join(hint(maxScoreUb(df, stats, k1)), Seq("term"))
      .join(hint(thrs), Seq("query_id"), "left")
      .withColumn("__cum", sum(col("__ub")).over(w))
      .where(col("__cum") >= coalesce(col("__thr"), lit(0L)))
      .select(col("term")).distinct()
    tfQ0.select(col("term"), col("doc_id"))
      .join(hint(essentialTerms), Seq("term"))
      .select(col("doc_id")).distinct()
  }

  /** The ranked prune's candidate set ([[bm25TopKIndexed]]'s
    * `maxScorePrune` scaladoc): seed → per-query θ → essential-prefix
    * candidates. The seed picks each query's matched terms by ub
    * DESCENDING (rarest first — shortest postings lists AND the
    * likeliest high scorers) until the EXCLUSIVE df prefix reaches k,
    * so a query's seed carries at least its rarest term and at least
    * ~k postings when the corpus has them; seed docs are scored
    * exactly (pass 1 restricts docs, never terms — every seed doc's
    * score is its true score) and θ_q is the k-th best, or 0 when
    * fewer than k seed pairs exist (no valid bound ⇒ no pruning for
    * that query).
    */
  private[graft] def topKCandidateDocs(
      index: TextIndex, qt: DataFrame, k: Int,
      k1: Double, b: Double,
      broadcastQueries: Boolean = true): DataFrame = {
    // the driver-literal form hints its query-derived relations
    // broadcast; the data-sized join form ([[bm25TopKJoin]]) leaves
    // every one of them to AQE — the matched vocabulary, seed-term
    // set, and threshold relation all scale with the query RELATION
    val hint: DataFrame => DataFrame =
      if (broadcastQueries) broadcast else identity
    val (stats, tfQ0, df) = qtRelations(index, qt, None, hint)
    val wSeed = Window.partitionBy(col("query_id"))
      .orderBy(col("__ub").desc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seedTerms = qt
      .join(hint(maxScoreUb(df, stats, k1).join(df, Seq("term"))),
        Seq("term"))
      .withColumn("__cum", sum(col("df")).over(wSeed))
      .where(col("__cum") - col("df") < k)
      .select(col("term")).distinct()
    val seedDocs = tfQ0.join(hint(seedTerms), Seq("term"))
      .select(col("doc_id")).distinct()
    val thrs = bm25ScoredIndexed(index, qt, k1, b,
        broadcastQueries = broadcastQueries,
        candidateDocs = Some(seedDocs))
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(
        col("score_e6").cast("double"), col("doc_id"), k).as("__top"))
      .select(col("query_id"),
        when(size(col("__top")) >= k,
          element_at(col("__top"), k).getField("val").cast("long"))
          .otherwise(lit(0L)).as("__thr"))
    maxScoreCandidateDocsPerQuery(tfQ0, qt, df, stats, k1, thrs, hint)
  }

  /** [[maxScoreCandidateDocs]] from a raw index + query-term table —
    * the ingest guardrail's entry point (recomputes the same tfQ/df/
    * stats relations the screen derives; all scan-shaped, never the
    * multiply).
    */
  private[graft] def maxScoreCandidates(
      index: TextIndex, qt: DataFrame, k1: Double, thr: Long,
      maxDfPpm: Option[Long],
      broadcastQueries: Boolean): DataFrame = {
    val hint: DataFrame => DataFrame =
      if (broadcastQueries) broadcast else identity
    val (stats, tfQ0, df) = qtRelations(index, qt, maxDfPpm, hint)
    maxScoreCandidateDocs(tfQ0, qt, df, stats, k1, thr, hint)
  }

  private[graft] def bm25ScoredIndexed(index: TextIndex, qt: DataFrame,
                                       k1: Double, b: Double,
                                       broadcastQueries: Boolean = true,
                                       maxDfPpm: Option[Long] = None,
                                       pruneThresholdE6: Option[Long] = None,
                                       candidateDocs: Option[DataFrame] = None
                                      ): DataFrame = {
    val hint: DataFrame => DataFrame =
      if (broadcastQueries) broadcast else identity
    val dl = index.doclen
    // stats is a one-row lazy agg, never a driver count()
    val (stats, tfQ0, df) = qtRelations(index, qt, maxDfPpm, hint)
    // LOSSLESS MaxScore-style candidate prune (threshold screens only —
    // `pruneThresholdE6` is the screen's own minScoreE6): every
    // per-term contribution is bounded by ub_t = ⌊idf_t·(k1+1)·1e6⌋
    // (the tf-saturation quotient is < k1+1 for any tf/dl), so sort a
    // query's matched terms by ub ascending and the longest prefix
    // whose ub-sum stays below the threshold is NON-ESSENTIAL: a doc
    // matching only prefix terms cannot reach the threshold, whatever
    // its tf/dl. Candidates are therefore the docs carrying at least
    // one ESSENTIAL term, and the scoring join runs over candidate
    // docs only — at decontamination-grade thresholds the
    // stopword-class postings (low idf ⇒ tiny ub ⇒ non-essential)
    // never reach the multiply. Exactness contract: every (query, doc)
    // at-or-above the threshold is scored EXACTLY as without the prune
    // (ub is a true upper bound from the same df/N the score uses);
    // pairs BELOW the threshold may be absent from the output, which
    // is why only the ≥-threshold callers (bm25ScreenIndexed,
    // ingestText) may set this. Unlike `maxDfPpm` (which drops terms
    // and changes scores by their ≈0 contributions) this prune never
    // changes a score. Cost: the ub relation is the df aggregate the
    // core already computes, the essential analysis is one window over
    // the (query, term) table (query-batch-sized), and the candidate
    // set is one distinct over the essential postings.
    val candDocs = candidateDocs.orElse(pruneThresholdE6.map(thr =>
      maxScoreCandidateDocs(tfQ0, qt, df, stats, k1, thr, hint)))
    val tfQ = candDocs.fold(tfQ0)(cd =>
      tfQ0.join(cd, Seq("doc_id"), "left_semi"))
    tfQ
      // df join FIRST: with maxDfPpm set, the inner join drops a
      // pruned term's postings BEFORE the query join multiplies them
      .join(hint(df), Seq("term"))
      .join(hint(qt), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), bm25TermE6(k1, b).as("e6"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("e6")).as("score_e6"))
  }

  /** The per-(term, doc) BM25 e6 score expression over columns
    * (tf, df, dl, __n, __sumdl) — ONE fixed parenthesization, floored
    * to an e6 integer before the cross-term sum (reduction-order
    * independence; scaladoc above). Shared by the ranked, threshold,
    * and streaming ([[graft.streaming.StreamOps.searchGate]]) forms so
    * their scores cannot drift.
    */
  private[graft] def bm25TermE6(k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) +
      (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val quot = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl") / (col("__sumdl").cast("double") / col("__n")))))
    floor(idf * quot * lit(1000000.0)).cast("long")
  }

  /** Pointwise mutual information over document-level term
    * co-occurrence — the collocation/embedding-prep statistic
    * (Church & Hanks 1990): pmi(x,y) = ln( p(x,y) / (p(x)·p(y)) )
    * with p(t) = docs containing t / N. High-PMI pairs are the
    * "New York"/"machine learning" multiword units a tokenizer or
    * phrase-mining pass wants; a training pipeline also uses the
    * matrix as word-vector input (PPMI factorization).
    *
    * Determinism: every formula input is an exact integer count
    * (n_ab, n_a, n_b, N < 2^53), emitted alongside a floor-e6
    * `ln((n_ab·N)/(n_a·n_b))` with ONE fixed parenthesization both
    * engines replay (the q113 ln precedent).
    *
    * 100 TB shape / fan-out control: pairs are generated by a per-doc
    * self-join over each document's DISTINCT vocab-surviving terms, so
    * the blow-up is Σ_d C(kept_d, 2) — bounded by two explicit knobs,
    * both replayed in the oracle: `minDf` prunes the vocabulary to
    * terms in ≥ minDf docs BEFORE pairing (rare-term pairs are
    * statistically meaningless at n_ab ≈ 1 anyway), and docs keeping
    * more than `maxTermsPerDoc` vocab terms are SKIPPED (the
    * boilerplate/concatenation outliers whose quadratic term would
    * dominate the job; standard phrase-mining practice). The self-join
    * shuffles on doc_id once; counts are map-side-combined.
    *
    * @return (term_a, term_b, n_a, n_b, n_ab, pmi_e6), term_a < term_b,
    *         restricted to pairs co-occurring in ≥ minDf docs
    */
  /** The Gopher quality RULES (Rae et al. 2021, "Scaling Language
    * Models: ... Gopher", §A1.1 table of repetition-free quality
    * filters — the published heuristic battery most web-corpus
    * pipelines start from), each as an EXACT integer/ratio test so an
    * external engine replays every flag digit-for-digit:
    *
    *  1. word count ∈ [50, 100,000]                       (flag_word_count)
    *  2. mean word length ∈ [3, 10] chars                 (flag_word_len)
    *     — integer-div milli: 3000 ≤ ⌊1000·chars/words⌋ ≤ 10000
    *  3. hash/ellipsis symbols ≤ 0.1 per word             (flag_symbol_ratio)
    *     — 10·(#'#' + #'...' + #'…') ≤ words
    *  4. ≥ 80% of words carry an alphabetic char          (flag_alpha)
    *     — 5·alpha_words ≥ 4·words
    *  5. ≤ 90% of lines start with a bullet (-, *, •)     (flag_bullets)
    *     — 10·bullet_lines ≤ 9·lines
    *  6. ≤ 30% of lines end with an ellipsis              (flag_ellipsis)
    *     — 10·ellipsis_lines ≤ 3·lines
    *  7. ≥ 2 distinct of the paper's required stopwords   (flag_stopwords)
    *     (the, be, to, of, and, that, have, with)
    *
    * `pass` is the conjunction. The raw counts ship alongside the
    * flags (a pipeline tunes thresholds per corpus; the counts are
    * the reusable part). Tokenization is the engine's shared
    * lowercased-whitespace [[graft.functions.TextFunctions.tokens]];
    * lines split on \n with trailing empties kept (the
    * [[CorpusPrep.stripBoilerplateLines]] rule). NULL texts drop.
    *
    * 100 TB shape: ONE narrow pass — every rule is a column
    * expression over the row's own text (token/line arrays bounded by
    * the document, like every per-doc text op); no shuffle at all
    * until a caller aggregates. Compose upstream of
    * [[graft.operators.CorpusPrep.clean]]'s gate or q103-style
    * quality reports.
    */
  def gopherQuality(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val reqStopwords =
      Seq("the", "be", "to", "of", "and", "that", "have", "with")
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("__t"))
      .withColumn("__words", TextFunctions.tokens(col("__t")))
      .withColumn("__lines", split(col("__t"), "\n", -1))
      .withColumn("n_words", size(col("__words")).cast("long"))
      .withColumn("n_chars",
        aggregate(org.apache.spark.sql.functions.transform(col("__words"),
          w => length(w).cast("long")), lit(0L), (a, x) => a + x))
      .withColumn("mean_word_len_milli",
        when(col("n_words") > 0,
          expr("(n_chars * 1000) DIV n_words")))
      .withColumn("n_symbols",
        (regexp_count(col("__t"), lit("#")) +
          regexp_count(col("__t"), lit("\\.\\.\\.")) +
          regexp_count(col("__t"), lit("…"))).cast("long"))
      .withColumn("n_alpha_words",
        size(org.apache.spark.sql.functions.filter(col("__words"),
          w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("n_bullet_lines",
        size(org.apache.spark.sql.functions.filter(col("__lines"),
          l => trim(l).rlike("^[-*•]"))).cast("long"))
      .withColumn("n_ellipsis_lines",
        size(org.apache.spark.sql.functions.filter(col("__lines"),
          l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long"))
      .withColumn("n_req_stopwords",
        size(array_intersect(array_distinct(col("__words")),
          array(reqStopwords.map(lit): _*))).cast("long"))
      .withColumn("flag_word_count",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("flag_word_len",
        coalesce(col("mean_word_len_milli") >= 3000L &&
          col("mean_word_len_milli") <= 10000L, lit(false)))
      .withColumn("flag_symbol_ratio",
        col("n_symbols") * 10L <= col("n_words"))
      .withColumn("flag_alpha",
        col("n_alpha_words") * 5L >= col("n_words") * 4L)
      .withColumn("flag_bullets",
        col("n_bullet_lines") * 10L <= col("n_lines") * 9L)
      .withColumn("flag_ellipsis",
        col("n_ellipsis_lines") * 10L <= col("n_lines") * 3L)
      .withColumn("flag_stopwords", col("n_req_stopwords") >= 2L)
      .withColumn("pass",
        col("flag_word_count") && col("flag_word_len") &&
          col("flag_symbol_ratio") && col("flag_alpha") &&
          col("flag_bullets") && col("flag_ellipsis") &&
          col("flag_stopwords"))
      .drop("__t", "__words", "__lines")
  }

  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               minDf: Int = 5, maxTermsPerDoc: Int = 1000): DataFrame = {
    require(minDf >= 1 && maxTermsPerDoc >= 2)
    val dt = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .distinct()
    // doc frequency over ALL docs with >= 1 token — the PMI universe
    val nDocs = dt.groupBy(col("doc_id")).agg(count(lit(1)).as("__terms"))
      .agg(count(lit(1)).as("n_docs"))
    val vocab = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
    val kept = dt.join(vocab, Seq("term"))
    val keptSized = kept.join(
      kept.groupBy(col("doc_id")).agg(count(lit(1)).as("__kept"))
        .where(col("__kept") <= maxTermsPerDoc),
      Seq("doc_id"))
    val a = keptSized.select(col("doc_id"), col("term").as("term_a"),
      col("df").as("n_a"))
    val bSide = keptSized.select(col("doc_id"), col("term").as("term_b"),
      col("df").as("n_b"))
    a.join(bSide, Seq("doc_id"))
      .where(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minDf)
      .crossJoin(broadcast(nDocs))
      .withColumn("pmi_e6",
        floor(log((col("n_ab") * col("n_docs")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")) * lit(1000000.0))
          .cast("long"))
      .select(col("term_a"), col("term_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("pmi_e6"))
  }

  /** Bigram language-model quality score — the CCNet/KenLM-style
    * perplexity filter a web-corpus pipeline runs to rank documents by
    * fluency (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data", 2020 — public method):
    * train an add-one-smoothed bigram model per language on a
    * reference split, score held-out documents by mean negative
    * log-likelihood per bigram. High scores = improbable token
    * sequences = boilerplate/garbled/spam; the ranking is what the
    * filter consumes (thresholds are a policy choice downstream).
    *
    * Model (per language):
    *   P(w2 | w1) = (c(w1,w2) + 1) / (ctx(w1) + V)
    * with ctx(w1) = Σ_w2 c(w1,w2) (bigram-start count) and V = distinct
    * token vocabulary of the language's training split. Per-bigram
    * surprisal term = ln((ctx + V)/(c12 + 1)) ≥ 0 (ctx ≥ c12, V ≥ 1).
    *
    * Engine-replayability: every ln input is a ratio of exact integer
    * counts cast to double (identical IEEE division in both engines);
    * each term is FLOORED to an e6 integer before the per-doc sum, so
    * the sum is 64-bit integer addition — reduction-order independent —
    * and nll_e6 = floor(Σ tf·term / n_bigrams) is a floor division of
    * integers. Same ln-precedent as the PMI screen ([[pmiPairs]]).
    *
    * Plan / 100 TB shape: bigrams come from one narrow zip of each
    * doc's token array (no self-join); model counts are two map-side-
    * combined aggregations at (lang, w1, w2) and (lang, w1) grain; V is
    * a lang-grain aggregate; scoring joins at (doc, w1, w2)-DISTINCT
    * grain (tf collapses repeats BEFORE the join) with no broadcast
    * hint on the model — a web-scale bigram table is billions of rows
    * and AQE must choose. Scored docs inner-join the V table: a
    * language with no training split has no model and emits nothing
    * (ln(0/1) = −∞ is the alternative — documented, not silent).
    *
    * Contract: scored docs need ≥ 2 tokens (≥ 1 bigram); shorter docs
    * are dropped, not scored 0 — a one-token doc has no sequence
    * evidence either way.
    *
    * @return (doc_id, lang, n_bigrams, nll_e6) — nll_e6 is the mean
    *         per-bigram surprisal × 1e6, floored; BIGINT throughout
    */
  def bigramLmScore(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    def bigrams(df: DataFrame): DataFrame = {
      val toks = TextFunctions.tokens(col(textCol))
      df.where(col(textCol).isNotNull)
        .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
          toks.as("__t"))
        .where(size(col("__t")) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(zip_with(
            slice(col("__t"), lit(1), size(col("__t")) - 1),
            slice(col("__t"), lit(2), size(col("__t")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
        .select(col("doc_id"), col("lang"),
          col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    }
    val trainBg = bigrams(train)
    val c12 = trainBg.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val ctx = c12.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c12")).as("ctx"))
    val vocab = train.where(col(textCol).isNotNull)
      .select(col(langCol).as("lang"),
        explode(TextFunctions.tokens(col(textCol))).as("__tk"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("__tk")).as("v"))
    val tf = bigrams(score)
      .groupBy(col("doc_id"), col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val term = floor(log(
      (coalesce(col("ctx"), lit(0L)) + col("v")).cast("double") /
        (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double")) *
      lit(1000000.0)).cast("long")
    tf.join(vocab, Seq("lang"))
      .join(ctx, Seq("lang", "w1"), "left")
      .join(c12, Seq("lang", "w1", "w2"), "left")
      .select(col("doc_id"), col("lang"), col("tf"), term.as("__term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("tf") * col("__term")).as("__sum"),
        sum(col("tf")).as("n_bigrams"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        expr("CAST(__sum DIV n_bigrams AS BIGINT)").as("nll_e6"))
  }

  /** Prefix autocomplete index — top-k corpus terms per prefix (the
    * search-suggest table): every 1..maxPrefixLen-char prefix of every
    * term, ranked by corpus term frequency (ties by term ASC). The
    * scale shape: term frequency is one map-side-combined count at
    * VOCAB grain; the prefix explode fans each term into at most
    * maxPrefixLen rows (still vocab-grain); the per-prefix rank window
    * partitions by prefix — bounded by the vocabulary under it, never
    * by corpus rows. Short terms contribute only their existing
    * prefixes.
    *
    * @return (prefix, rnk, term, tf), rnk ≤ k
    */
  def prefixSuggest(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPrefixLen: Int = 4,
      k: Int = 3): DataFrame = {
    val tf = docs.where(col(textCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val pre = tf.select(col("term"), col("tf"),
        explode(sequence(lit(1), least(length(col("term")),
          lit(maxPrefixLen)))).as("__p"))
      .select(substring(col("term"), 1, maxPrefixLen).substr(lit(1),
        col("__p")).as("prefix"), col("term"), col("tf"))
    val w = Window.partitionBy(col("prefix"))
      .orderBy(col("tf").desc, col("term").asc)
    pre.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("prefix"), col("rnk").cast("long").as("rnk"),
        col("term"), col("tf"))
  }

  /** Greedy bigram generation — the argmax walk of the corpus bigram
    * model: start from each language's most frequent token, repeatedly
    * take the most frequent successor (ties → token ASC), `steps`
    * times. Not a product feature — a MODEL INSPECTION readout (what
    * the q167 fluency model "thinks" its language sounds like; mode
    * collapse and template pollution show up immediately as looping
    * boilerplate), fully deterministic and engine-replayable because
    * every choice is an integer argmax with a total tie order.
    *
    * A walk that hits a dead-end token (no observed successor) stops —
    * shorter output, never a fabricated token. Vocab-grain throughout:
    * unigram/bigram counts are map-side combined; the per-token argmax
    * successor table is one window over the bigram vocabulary; the walk
    * itself is `steps` joins of a languages-sized frontier against it.
    */
  def greedyGenerate(
      docs: DataFrame,
      langCol: String,
      textCol: String,
      steps: Int): DataFrame = {
    require(steps >= 1 && steps <= 32, "steps in [1, 32]")
    val toks = docs.where(col(textCol).isNotNull)
      .select(col(langCol).as("lang"),
        TextFunctions.tokens(col(textCol)).as("tk"))
    val uni = toks.select(col("lang"), explode(col("tk")).as("t"))
      .groupBy(col("lang"), col("t")).agg(count(lit(1)).as("c"))
    val wSeed = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("t").asc)
    val seed = uni.withColumn("__rn", row_number().over(wSeed))
      .where(col("__rn") === 1).select(col("lang"), col("t"))
    val bi = toks.where(size(col("tk")) >= 2)
      .withColumn("ta", expr("slice(tk, 1, size(tk) - 1)"))
      .withColumn("tb", expr("slice(tk, 2, size(tk) - 1)"))
      .select(col("lang"), explode(arrays_zip(col("ta"), col("tb"))).as("p"))
      .select(col("lang"), col("p.ta").as("a"), col("p.tb").as("b"))
      .groupBy(col("lang"), col("a"), col("b")).agg(count(lit(1)).as("c"))
    val wNxt = Window.partitionBy(col("lang"), col("a"))
      .orderBy(col("c").desc, col("b").asc)
    val nxt = bi.withColumn("__rn", row_number().over(wNxt))
      .where(col("__rn") === 1)
      .select(col("lang").as("__nl"), col("a"), col("b"))
    var cur = seed.select(col("lang"), lit(0L).as("step"),
      col("t").as("token"))
    var acc = cur
    var i = 1
    while (i <= steps) {
      cur = cur.join(nxt,
          col("__nl") === col("lang") && col("a") === col("token"))
        .select(col("lang"), lit(i.toLong).as("step"),
          col("b").as("token"))
      acc = acc.unionByName(cur)
      i += 1
    }
    acc
  }

  /** Vocabulary drift between two corpus snapshots — the release-over-
    * release diff a training-data pipeline reviews before shipping:
    * per term, the document frequency in each snapshot, floor-ppm
    * document shares, the share delta, and a status classification
    * (`new` / `vanished` / `grown` / `shrunk`). Catches scraper
    * regressions (a vanished domain's vocabulary disappears), template
    * pollution (boilerplate terms surge), and language drift — none of
    * which a row-count diff sees.
    *
    * All-integer: shares are `df·1e6 div nDocs` (no engine rounds a
    * ratio), statuses are pure integer predicates. `minDf` prunes the
    * hapax tail BEFORE the share math (on the MAX of the two sides, so
    * a term vanishing from a large df is never pruned).
    *
    * 100 TB shape: one distinct-term explode + count per side (map-side
    * combined, vocab-grain output), one vocab-grain full-outer join, N
    * folded in as a lazy one-row crossJoin (the [[tfidf]] rule — never
    * an eager driver count).
    */
  def vocabDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 2L): DataFrame = {
    require(minDf >= 1L, "minDf must be >= 1")
    def dfCounts(d: DataFrame, out: String) = d
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as(out))
    def nDocs(d: DataFrame, out: String) = d
      .where(col(textCol).isNotNull)
      .agg(countDistinct(col(idCol)).as(out))
    dfCounts(oldDf, "df_a")
      .join(dfCounts(newDf, "df_b"), Seq("term"), "full_outer")
      .na.fill(0L, Seq("df_a", "df_b"))
      .where(greatest(col("df_a"), col("df_b")) >= minDf)
      .crossJoin(broadcast(nDocs(oldDf, "__na")))
      .crossJoin(broadcast(nDocs(newDf, "__nb")))
      .withColumn("share_a_ppm", expr("df_a * 1000000L div __na"))
      .withColumn("share_b_ppm", expr("df_b * 1000000L div __nb"))
      .withColumn("delta_ppm", col("share_b_ppm") - col("share_a_ppm"))
      .withColumn("status",
        when(col("df_a") === 0, lit("new"))
          .when(col("df_b") === 0, lit("vanished"))
          .when(col("delta_ppm") >= 0, lit("grown"))
          .otherwise(lit("shrunk")))
      .drop("__na", "__nb")
  }
}
