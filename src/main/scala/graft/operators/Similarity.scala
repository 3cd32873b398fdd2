package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Similarity search over an embedding column (SURVEY.md §3.3):
  * brute-force cosine top-k as the exact baseline, a random-hyperplane
  * LSH-bucketed variant as the 100 TB scale path, and cosine near-dup
  * pairs for embedding-level dedup.
  *
  * 100 TB design notes:
  *  - Brute force is the correctness baseline and the right choice when
  *    the QUERY side is small: it broadcasts the k·dim query matrix and
  *    scans the corpus once, one narrow stage + one shuffle for top-k —
  *    linear in corpus size, no pairwise blow-up.
  *  - The LSH variant buckets both sides on sign-pattern blocks so the
  *    join touches only colliding buckets — corpus-vs-corpus similarity
  *    (quadratic for brute force) becomes a bucket equi-join. Recall is
  *    tunable via blocks × planes-per-block; buckets carry an explicit
  *    size cap so a degenerate bucket cannot go quadratic (same guard as
  *    [[Dedup.minhashLSH]]).
  *  - All arithmetic is pure Catalyst (`zip_with`/`aggregate` fold in
  *    doubles, left-to-right) — deterministic, codegen'd, no UDF.
  */
object Similarity {

  /** Dot product of two array<double> columns — native codegen'd
    * expression ([[graft.functions.DotProduct]]); the higher-order
    * `aggregate(zip_with(...))` form is CodegenFallback and ~10× slower
    * on the pair-verification inner loop.
    */
  def dot(a: Column, b: Column): Column = VectorFunctions.dotProduct(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in one fused codegen'd loop; 0.0 when either
    * vector has zero norm ([[graft.functions.CosineSimilarity]]).
    */
  def cosine(a: Column, b: Column): Column = VectorFunctions.cosineSim(a, b)

  /** Exact top-k nearest neighbors by cosine for each query vector.
    *
    * `queries` must be small (it is broadcast); `corpus` can be
    * arbitrarily large — the plan is a broadcast nested-loop score pass
    * (narrow, codegen'd) followed by one top-k shuffle on query_id.
    * Self-matches (same id) are excluded. Deterministic ranking:
    * (cosine DESC, neighbor id ASC).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cvec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** HARD-NEGATIVE mining — [[bruteForceTopK]] with an exclusion
    * class: per query, the k most-similar corpus vectors whose label
    * DIFFERS from the query's (the "looks like a match but is not"
    * examples that make contrastive training sharp; random negatives
    * — [[graft.operators.Sampling.negativeSamples]] — are trivially
    * separable after the first epochs, hard negatives carry the
    * gradient after that). Same plan as brute force: broadcast the
    * (bounded) query batch, one narrow scored scan, per-query window
    * head; at real scale swap the scorer for [[lshTopK]]'s blocked
    * candidates and keep the label filter — the exclusion composes
    * with any retriever.
    *
    * @return (query_id, rank 1..k, neighbor_id, neighbor_label, cos)
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"),
      col(vecCol).cast("array<double>").as("cvec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__qlabel"),
      col(vecCol).cast("array<double>").as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id") &&
        !(col("neighbor_label") <=> col("__qlabel")))
      .select(col("query_id"), col("neighbor_id"), col("neighbor_label"),
        cosine(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neighbor_label"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes: `n` planes ×
    * `dim` coordinates in [-1, 1), derived from a 64-bit mix of
    * (seed, plane, coord) — no RNG state, reproducible across runs.
    */
  def hyperplanes(n: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(n, dim) { (p, i) =>
      var h = seed + p * 1048573L + i * 31L
      // splitmix64 finalizer
      h += 0x9e3779b97f4a7c15L
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      h = h ^ (h >>> 31)
      (h.toDouble / Long.MaxValue.toDouble)
    }

  /** Sign-pattern block keys for random-hyperplane LSH: `numBlocks`
    * independent blocks of `planesPerBlock` hyperplanes each; a block key
    * is the bit pattern of dot-product signs. Two vectors at angle θ agree
    * on one plane with probability 1-θ/π; they share a block with
    * p^planesPerBlock and at least one of B blocks with
    * 1-(1-p^r)^B.
    */
  def blockKeys(
      vec: Column,
      dim: Int,
      numBlocks: Int,
      planesPerBlock: Int,
      seed: Long): Column = {
    val planes = hyperplanes(numBlocks * planesPerBlock, dim, seed)
    val keys = (0 until numBlocks).map { b =>
      (0 until planesPerBlock).map { r =>
        val plane = planes(b * planesPerBlock + r)
        val d = dot(vec, typedlit(plane.toSeq))
        when(d >= 0.0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(keys: _*)
  }

  /** Approximate top-k: candidates are corpus vectors sharing at least one
    * LSH block with the query; exact cosine ranking on candidates only.
    * Scale path for corpus-sized query sets where broadcast is impossible:
    * both sides shuffle on (block_idx, block_key) — an equi-join, never a
    * cross join.
    *
    * `multiProbe` > 0 additionally probes, per block, the buckets whose
    * key differs from the query's in one sign among the FIRST
    * `multiProbe` planes (a fixed flip set — simpler than classic
    * multi-probe LSH, which ranks perturbations by the query's distance
    * to each hyperplane; at multiProbe = planesPerBlock the two
    * coincide, covering every single-flip neighbor bucket). Query-side
    * only: the corpus index is unchanged; each query row fans out
    * ×(1 + multiProbe) in the candidate join — recall rises for a
    * fraction of the cost of adding corpus-side blocks.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      numBlocks: Int = 8,
      planesPerBlock: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Int = 10000,
      multiProbe: Int = 0): DataFrame = {
    // fail fast: vectorIndex ends in an eager localCheckpoint, so
    // validating only inside lshTopKIndexed would burn a full corpus
    // collapse before surfacing an argument error
    require(multiProbe <= planesPerBlock,
      "multiProbe flips one plane each — at most planesPerBlock probes")
    lshTopKIndexed(
      vectorIndex(corpus, idCol, vecCol, dim, numBlocks, planesPerBlock,
        seed, maxBucketSize),
      queries, idCol, vecCol, dim, k, numBlocks, planesPerBlock, seed,
      multiProbe)
  }

  /** Corpus-side sign-pattern LSH index, reusable across query batches
    * (and persistable via [[IndexStore]]): capped block buckets,
    * representative vectors for exact scoring, and the exact-duplicate
    * member expansion. Same three-table shape as [[Dedup.CorpusIndex]],
    * with the vector value playing the text's role.
    */
  final case class VectorIndex(
      blocks: DataFrame, reps: DataFrame, members: DataFrame)

  /** The UNCAPPED rep-level index tables for a collapsed vector group
    * table (id, v, members) — shared by [[vectorIndex]] (caps them) and
    * [[IndexStore]] (persists them raw; cap applied at load so append ≡
    * rebuild, see [[Dedup.corpusTablesFromGroups]]).
    *
    * Returns (blocks (rep_id, band_idx, band_hash),
    *          reps (rep_id, v), members (rep_id, member_id)).
    */
  private[operators] def vectorTablesFromGroups(
      groups: DataFrame,
      dim: Int,
      numBlocks: Int,
      planesPerBlock: Int,
      seed: Long): (DataFrame, DataFrame, DataFrame) = {
    val blocks = vectorBlockRows(groups, dim, numBlocks, planesPerBlock, seed)
    val reps = groups.select(col("id").as("rep_id"), col("v"))
    val members = groups.select(col("id").as("rep_id"),
      explode(col("members")).as("member_id"))
    (blocks, reps, members)
  }

  /** Block rows alone for (id, v) groups — shared by
    * [[vectorTablesFromGroups]] and the torn-append heal in
    * [[graft.operators.IndexStore.appendVectorIndex]] (a crash-orphaned
    * reps row carries the vector, so its block rows are recomputable
    * with the SAME hyperplane geometry — heal ≡ rebuild by sharing).
    */
  private[operators] def vectorBlockRows(
      groups: DataFrame,
      dim: Int,
      numBlocks: Int,
      planesPerBlock: Int,
      seed: Long): DataFrame =
    groups.select(col("id").as("rep_id"),
      posexplode(blockKeys(col("v"), dim, numBlocks, planesPerBlock, seed))
        .as(Seq("band_idx", "band_hash")))

  private[operators] def capVectorTables(
      blocks: DataFrame, reps: DataFrame, members: DataFrame,
      maxBucketSize: Int): VectorIndex =
    VectorIndex(
      Dedup.keepCappedBuckets(blocks, maxBucketSize, minSize = 1),
      reps, members)

  def vectorIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numBlocks: Int = 8,
      planesPerBlock: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Int = 10000): VectorIndex = {
    // Exactly-identical corpus vectors are collapsed FIRST (the
    // cosineNearDupPairs skew guard; the 100× probe measured why: a
    // 100×-duplicated corpus puts every copy of a sign pattern in every
    // bucket and top-k scoring pays for each copy). Identical vectors
    // share signature and cosine, so scoring one representative and
    // expanding members back afterwards returns the IDENTICAL ranking
    // (ties already break on neighbor_id); the bucket cap counts
    // DISTINCT vectors.
    val groups = Dedup.textGroups(
      corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")),
      "id", "v")
      .select(col("id"), col("__text").cast("array<double>").as("v"), col("members"))
    val (blocks, reps, members) =
      vectorTablesFromGroups(groups, dim, numBlocks, planesPerBlock, seed)
    capVectorTables(blocks, reps, members, maxBucketSize)
  }

  /** [[lshTopK]] against a PREBUILT (or [[IndexStore.loadVectorIndex
    * loaded]]) corpus index. `dim`/`numBlocks`/`planesPerBlock`/`seed`
    * MUST match the index's build parameters (persisted indexes carry
    * them in their meta table) — the query side derives its probe keys
    * from the same hyperplanes.
    *
    * Candidate generation carries ONLY (id, block) — vectors are
    * hydrated per candidate pair afterwards, so the heavy embedding
    * payload never rides the numBlocks-duplicated explode/join shuffle
    * (same design as Dedup.verifiedJaccardPairs). The corpus-side
    * bucket cap is Dedup.keepCappedBuckets (partial-count agg +
    * semi-join), NOT a window count — a sort-based window over the
    * numBlocks-exploded corpus would shuffle-sort the whole exploded
    * table just to measure bucket sizes. minSize = 1: a singleton
    * corpus bucket still answers queries. Self-exclusion happens after
    * member expansion, so duplicate copies of the query's own vector
    * are still returned.
    */
  def lshTopKIndexed(
      idx: VectorIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      numBlocks: Int = 8,
      planesPerBlock: Int = 8,
      seed: Long = 42L,
      multiProbe: Int = 0): DataFrame = {
    require(multiProbe <= planesPerBlock,
      "multiProbe flips one plane each — at most planesPerBlock probes")
    // query side: the exact bucket plus (optionally) the multiProbe
    // single-plane-flip neighbor buckets
    val qn = queries.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val probeKeys = (0 until multiProbe).map(r => col("band_hash")
      .bitwiseXOR(lit(1L << r)))
    val q = qn
      .select(col("id"),
        posexplode(blockKeys(col("v"), dim, numBlocks, planesPerBlock, seed))
          .as(Seq("band_idx", "band_hash")))
      .withColumnRenamed("id", "query_id")
      .select(col("query_id"), col("band_idx"),
        explode(array(col("band_hash") +: probeKeys: _*)).as("band_hash"))
    val cand = idx.blocks.join(q, Seq("band_idx", "band_hash"))
      .select(col("query_id"), col("rep_id"))
      .distinct()
    val cv = idx.reps.select(col("rep_id"), col("v").as("cvec"))
    val qv = qn.select(col("id").as("query_id"), col("v").as("qvec"))
    val scored = cand.join(qv, Seq("query_id")).join(cv, Seq("rep_id"))
      .select(col("query_id"), col("rep_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
    val expanded = scored
      .join(idx.members.select(col("rep_id"),
        col("member_id").as("neighbor_id")), Seq("rep_id"))
      .where(col("neighbor_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    expanded.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Cosine THRESHOLD screen of a new batch against a prebuilt (or
    * [[IndexStore.loadVectorIndex loaded]]) corpus index — the
    * embedding sibling of [[Dedup.hammingJoinIndexed]] and the batch
    * twin of [[graft.streaming.StreamOps.vectorGateIndexed]]: emits
    * EVERY corpus match with cos ≥ threshold (not top-k), so a batch
    * vector with no row is semantically novel — the admission-gate
    * contract, where [[lshTopKIndexed]]'s ranked answer shape would
    * force a per-query aggregation. Candidate recall is the index's
    * sign-pattern block recall (a near-dup pair agreeing on no block
    * is missed — same approximation [[cosineNearDupPairs]] documents);
    * candidates carry ONLY (id, block) until the single hydrate join.
    * Parameters must match the index build (persisted indexes carry
    * them in meta). No self-exclusion: screening a batch against a
    * corpus that already contains it is the caller's re-ingest check.
    */
  def cosineJoinIndexed(
      idx: VectorIndex,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numBlocks: Int = 8,
      planesPerBlock: Int = 8,
      seed: Long = 42L): DataFrame = {
    val qn = batch.select(col(idCol).as("new_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    val q = qn.select(col("new_id"),
      posexplode(blockKeys(col("qvec"), dim, numBlocks, planesPerBlock, seed))
        .as(Seq("band_idx", "band_hash")))
    val cand = idx.blocks.join(q, Seq("band_idx", "band_hash"))
      .select(col("new_id"), col("rep_id"))
      .distinct()
    cand
      .join(qn, Seq("new_id"))
      .join(idx.reps.select(col("rep_id"), col("v").as("cvec")), Seq("rep_id"))
      .select(col("new_id"), col("rep_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
      .where(col("cos") >= threshold)
      .join(idx.members.select(col("rep_id"),
        col("member_id").as("corpus_id")), Seq("rep_id"))
      .select(col("new_id"), col("corpus_id"), round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-duplicate pairs: (id_a < id_b, cos >=
    * threshold). The embedding-space member of the dedup family
    * (SURVEY §3.3).
    *
    * Exactly-identical vectors are collapsed FIRST (one groupBy on the
    * vector value), LSH candidate generation runs on the distinct
    * representatives only, and group members are expanded back into the
    * answer at the end (within-group pairs score cos = 1.0 by identity
    * — except zero vectors, whose cosine is 0 by convention). Without
    * this, duplicate-heavy corpora (the NORM for embedding dedup — that
    * is why one runs it) flood every LSH block with same-key members
    * and the in-bucket expansion goes quadratic in the duplication
    * factor: measured 443 s → 14 s at 20k vectors with 10× planted
    * duplication. The answer set itself is unchanged — it is
    * output-bounded either way.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numBlocks: Int = 8,
      planesPerBlock: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Int = 10000): DataFrame = {
    // collapse exact duplicates (Dedup's shared group machinery; the
    // grouping value here is the vector itself), LSH on representatives,
    // expand members back. Identity pairs score 1.0 except zero vectors
    // (cosine 0 by convention) — the final threshold filter covers both
    // the identity and the inherited-cross scores.
    val ids = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val groups = Dedup.textGroups(ids, "id", "v")
      .select(col("id"), col("__text").cast("array<double>").as("vec"), col("members"))
    val blocked = groups.select(col("id"),
      posexplode(blockKeys(col("vec"), dim, numBlocks, planesPerBlock, seed))
        .as(Seq("band_idx", "band_hash")))
    val cand = Dedup.bucketPairs(blocked, maxBucketSize)
    val va = groups.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val vb = groups.select(col("id").as("id_b"), col("vec").as("vec_b"))
    val repPairs = cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("vec_a"), col("vec_b")), 6).as("cos"))
      .where(col("cos") >= threshold)
    val identCos = when(dot(col("vec"), col("vec")) > 0.0, 1.0).otherwise(0.0)
    Dedup.expandGroups(repPairs,
        groups.select(col("id"), col("vec"), col("members")),
        "cos", identCos, lit(true))
      .where(col("cos") >= threshold)
  }

  /** SEMANTIC eval-set decontamination — the embedding-space sibling of
    * [[Dedup.decontaminate]]'s n-gram overlap check: flag every corpus
    * row whose vector scores cosine >= `threshold` against ANY eval/
    * benchmark vector. N-gram decontamination misses paraphrases and
    * light edits (a benchmark item with one token changed shares almost
    * no 8-gram), but its embedding barely moves — this is the stage
    * that catches it. Output is one row per contaminated corpus id:
    * `(corpus_id, n_hits, top_eval_id, top_cos)` with the top hit
    * deterministically ranked (cos DESC, eval_id ASC).
    *
    * 100 TB posture: eval suites are small by nature, so the plan is
    * the [[bruteForceTopK]] shape — broadcast the eval side, one
    * narrow codegen'd score-and-filter pass over the corpus (no shuffle
    * of corpus rows), then window-rank only the surviving hits, a set
    * sized by actual contamination, not by the corpus.
    */
  def embeddingDecontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("__cvec"))
    val e = evalSet.select(col(idCol).as("eval_id"),
      col(vecCol).cast("array<double>").as("__evec"))
    val hits = c.crossJoin(broadcast(e))
      .select(col("corpus_id"), col("eval_id"),
        cosine(col("__cvec"), col("__evec")).as("cos"))
      .where(col("cos") >= threshold)
    // rank on the RAW cosine (bit-identical across engines — the shared
    // q23 kernel contract); round only in the reported column
    val byCorpus = Window.partitionBy(col("corpus_id"))
    val rk = row_number().over(byCorpus
      .orderBy(col("cos").desc, col("eval_id").asc))
    hits.withColumn("__rk", rk)
      .withColumn("n_hits", count(lit(1)).over(byCorpus))
      .where(col("__rk") === 1)
      .select(col("corpus_id"), col("n_hits"),
        col("eval_id").as("top_eval_id"), round(col("cos"), 6).as("top_cos"))
  }

  /** SemDeDup — cluster-then-prune semantic deduplication (Abbas et
    * al., "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication", 2023 — public method): assign every
    * vector to its nearest centroid, then compare pairs ONLY within a
    * cluster and prune any vector whose cosine to a LOWER-ID
    * same-cluster vector meets the threshold. Clustering is what makes
    * web-scale semantic dedup affordable: the quadratic is per-cluster
    * (Σ nᵢ² ≪ n²), and cross-cluster near-dups are out of scope BY
    * DESIGN (the paper's trade — [[nearDuplicates]] is the certified-
    * recall alternative when misses are not acceptable).
    *
    * Determinism: the paper prunes greedily in scan order; this
    * operator prunes on the lower-id-neighbor rule instead — a pure
    * function of the input (order-greedy keep-sets are not expressible
    * as a declarative plan, and partitioning-dependent output would be
    * un-oracle-able). Ties in centroid assignment go to the lowest
    * centroid index ([[IvfIndex.assign]]'s contract).
    *
    * Plan: one narrow assignment pass (centroid matrix folds in as a
    * literal — O(k) driver data, the IVF precedent), one
    * cluster-keyed self-join filtered by the codegen'd cosine, one
    * distinct over pruned ids, one labeling join. The cluster-size
    * guard raises INSIDE the joined projection (data path — cannot be
    * pruned) before a hub cluster goes quadratic.
    *
    * @param centroids k coarse centroids (from [[IvfIndex.build]] at
    *                  scale, or any deterministic seed set)
    * @return (id, cluster, pruned) for EVERY input vector
    */
  def semDeDup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      threshold: Double,
      maxClusterSize: Int = 100000): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val asg = IvfIndex.assign(corpus, idCol, vecCol, centroids)
    val rows = corpus
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("__v"))
      .join(asg, Seq("id"))
      .select(col("id"), col("__v"), col("list_id").as("cluster"))
    val sized = rows.join(
      rows.groupBy(col("cluster")).agg(count(lit(1)).as("__cs")),
      Seq("cluster"))
    val guardedVec = when(col("__cs") <= maxClusterSize, col("__v"))
      .otherwise(raise_error(concat(
        lit("Similarity.semDeDup: cluster "), col("cluster").cast("string"),
        lit(" holds "), col("__cs").cast("string"),
        lit(s" vectors (> $maxClusterSize); raise the centroid count " +
          "or the cap before going quadratic"))).cast("array<double>"))
    val a = sized.select(col("cluster"), col("id").as("id_a"),
      guardedVec.as("__va"))
    val b = sized.select(col("cluster"), col("id").as("id_b"),
      guardedVec.as("__vb"))
    val pruned = a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b") &&
        cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("__p", lit(true))
    rows.join(pruned, Seq("id"), "left")
      .select(col("id"), col("cluster").cast("long").as("cluster"),
        coalesce(col("__p"), lit(false)).as("pruned"))
  }

  /** Nearest-centroid (prototype) classifier evaluation — the
    * embedding-quality smoke test every representation-learning
    * pipeline runs: class centroids from a TRAIN split, every TEST
    * vector assigned to its nearest centroid, confusion counts out.
    * High prototype accuracy ⇒ the embedding space separates labels
    * linearly; a collapsed or shuffled space shows up immediately.
    *
    * Exactness design: embeddings are QUANTIZED to e6 integers first
    * (floor(x·1e6) — float sums are reduction-order-dependent, the
    * [[graft.operators.Stats]] determinism rule; at e6 the projection
    * loses nothing a classifier could legitimately depend on), so
    * centroid components (floor of an integer-sum mean), squared-L2
    * distances, and the (dist, label) argmin are ALL exact integers —
    * any engine replays the confusion matrix digit-for-digit.
    *
    * Shape: pos-exploded component grain (rows × dim), one (label,
    * pos) centroid aggregation, one test×centroid join at (pos) —
    * fan-out = nLabels, vocab-bounded — one distance aggregation, one
    * argmin window over nLabels rows per test vector.
    */
  def prototypeEval(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      labelCol: String,
      embCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def quantized(df: DataFrame) = df
      .where(col(embCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).as("__lab"),
        posexplode(transform(col(embCol).cast("array<double>"),
          x => floor(x * lit(1000000.0)).cast("long"))).as(Seq("__pos", "__q")))
    val centroids = quantized(train)
      .groupBy(col("__lab").as("__cl"), col("__pos"))
      .agg(count(lit(1)).as("__n"), sum(col("__q")).as("__s"))
      .withColumn("__c",
        floor(col("__s").cast("double") / col("__n").cast("double"))
          .cast("long"))
      .select(col("__cl"), col("__pos"), col("__c"))
    val dists = quantized(test)
      .join(centroids, Seq("__pos"))
      .groupBy(col("__id"), col("__lab"), col("__cl"))
      .agg(sum((col("__q") - col("__c")) * (col("__q") - col("__c")))
        .as("__d"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__d").asc, col("__cl").asc)
    dists.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .groupBy(col("__lab").as("label"), col("__cl").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
