package graft.operators

import graft.functions.{SetExpressions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the
  * PPJoin/AllPairs family: Bayardo, Ma, Srikant "Scaling Up All Pairs
  * Similarity Search", WWW'07; Xiao et al. PPJoin, WWW'08 — public
  * algorithms) — every document pair whose TOKEN-SET Jaccard meets a
  * threshold, with a completeness PROOF instead of the MinHash family's
  * probabilistic recall (Dedup.minhashLSH / ngramJaccardPairs trade
  * certainty for fewer candidates; this operator is the certainty end
  * of that dial, the one an eval-set builder or a legal-compliance
  * dedup run wants).
  *
  * Prefix-filtering principle: order every document's distinct tokens
  * by ONE global total order — ascending document frequency, ties by
  * token string — and keep only each document's first
  * |x| − ⌈t·|x|⌉ + 1 tokens (its "prefix"). Any pair with
  * Jaccard ≥ t must share at least one token IN BOTH PREFIXES: if all
  * common tokens sat outside x's prefix they would number at most
  * ⌈t·|x|⌉ − 1 < t·|x| ≤ t·|x∪y| ≤ |x∩y|, a contradiction (and
  * symmetrically for y). So the (prefix-token) equi-join loses
  * nothing, and the rare-token-first order makes prefix buckets the
  * SMALLEST buckets in the corpus — frequency ordering is what turns
  * the theorem into a practical join.
  *
  * Everything downstream is exact integers: candidates verify with the
  * codegen'd merge-walk |∩| ([[graft.functions.SetExpressions]]), the
  * keep predicate is `inter·1e6 ≥ t_ppm·union` (no float Jaccard
  * anywhere), and the emitted `jac_ppm` is a floor division.
  *
  * Plan / 100 TB shape: one tokenize pass → distinct (doc, token) →
  * token df counts (map-side combined) → per-doc (df, token) sort
  * WINDOW partitioned by doc (never global) → prefix filter → one
  * equi-join on the prefix token with id_a < id_b → distinct pairs →
  * hydrate both docs' sorted token arrays → narrow verify. The only
  * shuffles are the df count, the per-doc window sort, and the
  * candidate join. Skew guard: a prefix token shared by more than
  * `maxPrefixBucket` docs RAISES (by the frequency order such a token
  * exists only if the corpus is pathological — e.g. every doc is one
  * word — and the quadratic bucket would otherwise OOM an executor
  * silently).
  *
  * Caller contract: docs with NO tokens (null/blank text) are dropped —
  * Jaccard is undefined on an empty set (0/0); they pair with nothing.
  *
  * @param thresholdPpm Jaccard threshold in parts-per-million
  *                     (600000 = 0.6); exact-integer predicate
  * @param maxPrefixBucket raise if any prefix-token candidate bucket
  *                        exceeds this many documents
  * @return (id_a, id_b, inter, uni, jac_ppm), id_a < id_b, all BIGINT
  */
object SetSimJoin {

  def tokenJaccardSelfPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdPpm: Long,
      maxPrefixBucket: Int = 10000): DataFrame =
    selfPairs(df, idCol, TextFunctions.tokens(col(textCol)), thresholdPpm,
      maxPrefixBucket)

  /** [[tokenJaccardSelfPairs]] over distinct word n-gram (shingle)
    * sets — the near-dup unit ([[Dedup.minhashLSH]]'s metric, here
    * EXACT). Shingles are the prefix filter's best case: a shingle
    * vocabulary is orders of magnitude sparser than its word
    * vocabulary, so prefix buckets stay tiny even on a corpus whose
    * word distribution is dense (measured on the synthetic corpus at
    * t = 0.9: 9k shingle candidates vs 2.1M word candidates — the
    * word-unit join is the wrong tool there, and this is the right
    * one).
    */
  def shingleJaccardSelfPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      thresholdPpm: Long,
      maxPrefixBucket: Int = 10000): DataFrame =
    selfPairs(df, idCol,
      TextFunctions.shingles(col(textCol), shingleSize), thresholdPpm,
      maxPrefixBucket)

  private def selfPairs(
      df: DataFrame,
      idCol: String,
      unit: org.apache.spark.sql.Column,
      thresholdPpm: Long,
      maxPrefixBucket: Int): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm <= 1000000L,
      "thresholdPpm must be in (0, 1000000]")
    val tok = df
      .select(col(idCol).as("id"), explode(unit).as("term"))
      .distinct()
    val dfCounts = tok.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    // per-doc rank in the global (df asc, term asc) order + set size;
    // prefix length p = n - ceil(t*n) + 1, ceil in exact integers
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__df").asc, col("term").asc)
    val ranked = tok.join(dfCounts, Seq("term"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("id"))))
    // ceil(t·n) in exact integers: (n·t_ppm + 999999) DIV 1e6
    val prefix = ranked.where(col("__rn") <= col("__n") + lit(1) -
        expr(s"(__n * ${thresholdPpm}L + 999999L) DIV 1000000L"))
      .select(col("id"), col("term"), col("__n"))
    // pair generation per prefix-token bucket, hub guard fused into the
    // generating CASE (FuzzyJoin pattern — the raise produces the data,
    // so column pruning can never elide it). The LENGTH FILTER (the
    // AllPairs/PPJoin companion pruning rule) runs INSIDE the bucket:
    // |∩| ≤ min(|x|,|y|) and |∪| ≥ max(|x|,|y|), so Jaccard ≥ t forces
    // t·max ≤ min — on a near-dup threshold (t → 1) this kills almost
    // every size-mismatched candidate before the pair ever reaches the
    // shuffle, which is what keeps a shared-vocabulary corpus (prefix
    // buckets that are large but size-diverse) from going quadratic.
    val cand = prefix.groupBy(col("term"))
      .agg(array_sort(collect_list(struct(col("id"), col("__n").as("n"))))
        .as("ids"))
      .select(explode(expr(
        s"""CASE WHEN size(ids) <= $maxPrefixBucket THEN
           |  flatten(transform(ids, (x, i) ->
           |    filter(transform(slice(ids, i + 2, size(ids)),
           |             y -> struct(x.id AS id_a, x.n AS na,
           |                         y.id AS id_b, y.n AS nb)),
           |           p -> least(p.na, p.nb) * 1000000L >=
           |                greatest(p.na, p.nb) * ${thresholdPpm}L)))
           |ELSE raise_error(concat('SetSimJoin: prefix token bucket holds ',
           |  cast(size(ids) AS string), ' docs (> $maxPrefixBucket); the ',
           |  'token distribution is degenerate - raise maxPrefixBucket ',
           |  'or pre-filter boilerplate'))
           |END""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    // hydrate each side's full sorted token array once, verify exactly.
    // The BOUNDED merge-walk (round-17): the keep predicate below is
    // exactly `inter·1e6 ≥ t_ppm·uni`, so the kernel's positional abort
    // returns −1 for provably-failing candidates (most of them, at a
    // near-dup threshold) after ~(1−t)·n comparisons instead of n —
    // surviving pairs still get the exact count the output emits.
    val sets = tok.groupBy(col("id"))
      .agg(sort_array(collect_list(col("term"))).as("toks"))
    val inter = SetExpressions.sortedIntersectCountBounded(
      col("ta"), col("tb"), thresholdPpm).cast("long")
    cand
      .join(sets.select(col("id").as("id_a"), col("toks").as("ta")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("toks").as("tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        inter.as("inter"),
        (size(col("ta")) + size(col("tb"))).cast("long").as("__sz"))
      .withColumn("uni", col("__sz") - col("inter"))
      .where(col("inter") * 1000000L >= col("uni") * thresholdPpm)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        expr("CAST((inter * 1000000L) DIV uni AS BIGINT)").as("jac_ppm"))
  }
}
