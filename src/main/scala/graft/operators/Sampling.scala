package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data assembly (SURVEY §3.3
  * family): a row is kept iff a STABLE content-independent hash of its
  * id falls under the stratum's rate — no RNG state, so the sample is
  * reproducible across runs, engines, and partitionings (`df.sample` is
  * none of those: its Bernoulli draw depends on partition layout), and
  * it composes with incremental ingest (a doc's verdict never changes
  * as the corpus around it grows).
  *
  * The hash is the first 60 bits of md5(id) — a standard digest any
  * engine computes identically (the q19/q14 portable-hash technique),
  * which is what makes the sample externally auditable: the DuckDB
  * oracle replays it bit-for-bit.
  *
  * 100 TB posture: one narrow codegen'd filter — no shuffle, no state;
  * rates multiply correctly under repeated application with distinct
  * salts.
  */
object Sampling {

  /** Uniform bucket in [0, 100) from the shared portable hash
    * ([[graft.functions.PortableHash.hash60]] — one definition so the
    * DuckDB replays can never drift between operators; salts must not
    * contain chr(1)).
    */
  def hashBucket(id: Column, salt: String = ""): Column =
    (graft.functions.PortableHash.hash60(id, salt) % 100).cast("int")

  /** Keep rows whose hash bucket < `pct` (≈ pct% deterministic sample). */
  def hashSample(df: DataFrame, idCol: String, pct: Int, salt: String = ""): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct in [0, 100]")
    df.where(hashBucket(col(idCol), salt) < pct)
  }

  /** Per-stratum rates — the real training-mix shape (downsample the
    * dominant stratum, keep the rare ones): rows in a stratum absent
    * from `rates` fall back to `defaultPct`.
    */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Int],
      defaultPct: Int = 100,
      salt: String = ""): DataFrame = {
    require((defaultPct +: rates.values.toSeq).forall(p => p >= 0 && p <= 100))
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, p).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), salt) < rate)
  }

  /** 2^60 as a double — exact (a power of two); the denominator turning
    * the 60-bit hash into a uniform draw in [0, 1).
    */
  private val TwoPow60 = 1152921504606846976.0

  /** WEIGHTED deterministic sampling: keep a row with probability equal
    * to the per-row `prob` column (clamped semantics: prob ≤ 0 never
    * keeps, ≥ 1 always keeps) — quality-weighted corpus downsampling.
    * The row's uniform draw is hash60/2^60: long→double conversion and
    * the power-of-two division are both IEEE-exact-or-correctly-rounded
    * identically in any engine, so the keep decision — like everything
    * else in this file — is reproducible and externally auditable.
    * One narrow filter; same salt-composition rules as [[hashSample]].
    */
  def weightedHashSample(
      df: DataFrame,
      idCol: String,
      prob: Column,
      salt: String = ""): DataFrame =
    // the explicit prob >= 1 arm makes "always keep" exact: hash values
    // within ~128 of 2^60 ROUND to draw == 1.0 under long→double, and
    // 1.0 < 1.0 would drop a certainty-kept row (oracle mirrors the OR)
    df.where((graft.functions.PortableHash.hash60(col(idCol), salt)
      .cast("double") / TwoPow60 < prob) || prob >= 1.0)

  /** TEMPERATURE mixture rebalancing — the `n^alpha` stratum resampling
    * every multilingual / multi-source training mix runs (alpha = 1/2
    * here): the DOMINANT stratum keeps `baseRate` of its rows and every
    * rarer stratum is boosted by `sqrt(n_max / n_s)`, capped at
    * certainty, so expected stratum sizes follow `sqrt(n)` proportions
    * until the cap bites — the head is flattened without exhausting the
    * tail. Alpha is FIXED at 1/2 because the whole pipeline is
    * externally auditable: `sqrt`, divide and multiply are all
    * correctly-rounded IEEE ops any engine computes bit-identically,
    * while `pow` (arbitrary alpha) is not — a last-ulp disagreement
    * would flip keep decisions at the draw boundary. The anchor is the
    * largest stratum's EXACT integer count, so no float summation ever
    * enters the rate.
    *
    * 100 TB posture: one map-side-combined count aggregation (strata-
    * sized result), a broadcast rate join, and [[weightedHashSample]]'s
    * narrow filter — the corpus is never shuffled.
    */
  def temperatureSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      baseRate: Double,
      salt: String = ""): DataFrame = {
    require(baseRate > 0.0 && baseRate <= 1.0, "baseRate in (0, 1]")
    require(!df.columns.contains("__ts_rate"),
      "temperatureSample uses __ts_rate internally — rename that column")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__ts_n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(max(col("__ts_n")).as("__ts_max"))))
      // operand order is part of the contract: baseRate * sqrt(max / n),
      // mirrored token-for-token by the DuckDB oracle (q93)
      .select(col(strataCol),
        least(lit(1.0), lit(baseRate) *
          sqrt(col("__ts_max").cast("double") / col("__ts_n").cast("double")))
          .as("__ts_rate"))
    weightedHashSample(
      df.join(broadcast(rates), Seq(strataCol)), idCol, col("__ts_rate"), salt)
      .drop("__ts_rate")
  }

  /** EXACT-size deterministic sample: the k smallest-hash rows per
    * stratum — the "give me a fixed 10k-doc eval set per language"
    * primitive, where rate-based sampling ([[hashSample]]) can only hit
    * a size in expectation. Runs on [[TopKAgg]]'s bounded k-slot
    * aggregate, so the plan ships O(strata × k) pairs through the
    * exchange instead of window-sorting every stratum's full row set.
    * Unlike the rate-based samplers, membership is NOT stable under
    * corpus growth (a new row with a smaller hash displaces the
    * current k-th) — that is inherent to exact-k; pin the corpus
    * version when the sample must be reproducible later.
    *
    * The hash is cast to double for the aggregate (2^60 > 2^53, so the
    * cast rounds — identically in any IEEE engine; the id ASC tie-break
    * covers hashes that collide post-rounding).
    *
    * @return one row per sampled id: (stratum, sample_rank from 1 by
    *         ascending hash, id)
    */
  def exactKSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    // negate: TopKAgg keeps the k LARGEST values; negation of the
    // already-rounded double is exact, so "largest -hash" = "smallest
    // hash" with no further rounding
    val keep = TopKAgg.topK(
      -graft.functions.PortableHash.hash60(col(idCol), salt).cast("double"),
      col(idCol), k)
    df.groupBy(col(strataCol)).agg(keep.as("__ks"))
      .select(col(strataCol), posexplode(col("__ks")).as(Seq("__i", "__s")))
      .select(col(strataCol), (col("__i") + 1).as("sample_rank"),
        col("__s").getField("id").as(idCol))
  }

  /** Deterministic named split assignment (train/val/test): the id's
    * hash bucket against cumulative percent ranges. Stable across runs,
    * engines, and corpus growth — a doc never migrates between splits
    * as ingest continues (the property that keeps eval sets honest).
    */
  def splitColumn(id: Column, splits: Seq[(String, Int)], salt: String = "split"): Column = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100 &&
      splits.forall { case (_, p) => p >= 0 && p <= 100 },
      "split percents must each be in [0,100] and total 100")
    val b = hashBucket(id, salt)
    splits.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, cum), (name, pct)) =>
        (when(b >= cum && b < cum + pct, name).otherwise(acc), cum + pct)
    }._1
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * hash(id, salt) mod k — every row lands in exactly one of k
    * disjoint folds, stable across runs/partitionings/engines (the
    * [[splitColumn]] argument with a modulus instead of percent
    * boundaries). Fold i's training set is "every fold but i" BY
    * CONSTRUCTION, so train/test disjointness needs no bookkeeping.
    * Compose with [[leakProofSplit]]'s representative ids when
    * near-duplicates must co-fold.
    */
  def foldColumn(id: Column, k: Int, salt: String = "fold"): Column = {
    require(k >= 2 && k <= 1000, "fold count k in [2, 1000]")
    (graft.functions.PortableHash.hash60(id, salt) % k).cast("int")
  }

  /** LEAKAGE-PROOF split assignment: like [[splitColumn]], but near-
    * duplicate documents always land in the SAME split. Hashing each
    * doc independently leaks — a train doc's near-copy in test inflates
    * eval scores — so the split key is the document's duplicate-GROUP
    * representative (smallest id reachable through the pair graph,
    * [[Dedup.connectedComponents]]), not the document itself.
    * Documents in no pair keep their own id as representative, so for
    * a dup-free corpus this degrades to exactly [[splitColumn]].
    *
    * @param pairs  near-duplicate edges (id_a, id_b), e.g. from
    *               [[Dedup.minhashLSH]]; extra columns ignored
    * @return input plus `rep_id` (group representative) and `split`
    *
    * 100 TB posture: the pair graph is the tiny near-dup remnant, so
    * the components fixpoint runs on candidate-sized data; the corpus
    * itself takes ONE left join against the components-sized label
    * table (AQE broadcasts it) and a narrow hash projection — the
    * corpus is never shuffled.
    */
  def leakProofSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Int)],
      salt: String = "split"): DataFrame = {
    // loud, not clobbered: the output columns are part of the contract
    require(!df.columns.contains("rep_id") && !df.columns.contains("split"),
      "leakProofSplit adds rep_id/split — rename the existing columns first")
    // __-prefix the label column so a corpus carrying its own group_id
    // (a perfectly plausible schema) neither collides nor is consumed
    val labels = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("group_id").as("__lps_group"))
    df.join(labels, Seq(idCol), "left")
      .withColumn("rep_id", coalesce(col("__lps_group"), col(idCol)))
      .drop("__lps_group")
      .withColumn("split", splitColumn(col("rep_id"), splits, salt))
  }

  /** Deterministic NEGATIVE SAMPLING for contrastive training — for
    * each anchor in `positives` (anchor_id, pos_id), draw `k`
    * pseudo-random items from `pool` that are NOT that anchor's
    * positives (and not the anchor itself): the (query, positive,
    * negatives...) triples every embedding/retrieval trainer consumes.
    * No RNG anywhere — draw j of anchor q indexes the pool at
    * `hash60(q, "neg#j") mod |pool|` ([[hashBucket]]'s portable md5
    * recipe), so any engine replays the exact sample and a re-run on
    * appended data changes only what the pool change forces.
    *
    * Collision handling is draw-dropping, not re-drawing: a draw that
    * lands on a positive (or the anchor, or a duplicate item of an
    * earlier draw) is discarded and the remaining draws keep their
    * order — re-draw loops have data-dependent depth, which neither a
    * fixed plan nor an external replay can express. Oversample
    * (`draws` > k, default 2k) so k survivors remain; the operator
    * emits at most k per anchor, fewer ONLY if draws ran out (the
    * caller sees it in the rank column, nothing silently pads).
    *
    * 100 TB shape: the pool is dense-indexed ONCE by a pool-grain
    * window sort (a negative pool is vocabulary-like — item catalog,
    * doc registry — the [[graft.operators.Encoding.labelDictionary]]
    * boundedness argument; it is NOT the event stream); draws are a
    * narrow k-way explode of the anchors joined to the pool index by
    * equi-join, positives anti-join per (anchor, item). One shuffle on
    * the draw join key, map-side-combined nothing — output is
    * O(anchors × k).
    *
    * @return (anchor_id, rank 1..≤k, neg_id), rank in draw order
    */
  def negativeSamples(
      positives: DataFrame,
      pool: DataFrame,
      anchorCol: String,
      posCol: String,
      poolIdCol: String,
      k: Int,
      draws: Int = 0,
      salt: String = "neg"): DataFrame = {
    require(k >= 1, "k must be positive")
    val m = if (draws > 0) draws else 2 * k
    require(m >= k, "draws must be >= k")
    import org.apache.spark.sql.expressions.Window
    // item-DICTIONARY-grain global window: its input is the distinct
    // pool catalog (the labelDictionary bound), never the
    // interaction/event table the anchors come from
    val idx = pool.select(col(poolIdCol).as("__item"))
      .where(col("__item").isNotNull).distinct()
      .withColumn("__pos",
        row_number().over(Window.orderBy(col("__item").asc)).cast("long") - 1)
    val n1 = idx.agg(count(lit(1)).as("__n"))
    val anchors = positives.select(col(anchorCol).as("__a")).distinct()
    val drawn = anchors.crossJoin(broadcast(n1))
      .withColumn("__j", explode(array((0 until m).map(lit): _*)))
      .withColumn("__pos", when(col("__n") > 0,
        graft.functions.PortableHash.hash60(
          concat(col("__a").cast("string"), lit("#"), col("__j").cast("string")),
          salt) % col("__n")))
      .join(idx, Seq("__pos"))
    val posSet = positives.select(col(anchorCol).as("__a"),
      col(posCol).as("__item")).distinct()
    val survivors = drawn
      .join(posSet, Seq("__a", "__item"), "left_anti")
      .where(col("__item") =!= col("__a"))
      // duplicate items among one anchor's draws: keep the earliest j
      .groupBy(col("__a"), col("__item"))
      .agg(min(col("__j")).as("__j"))
    val wr = Window.partitionBy(col("__a"))
      .orderBy(col("__j").asc, col("__item").asc)
    survivors
      .withColumn("rank", row_number().over(wr).cast("long"))
      .where(col("rank") <= k)
      .select(col("__a").as(anchorCol), col("rank"), col("__item").as("neg_id"))
  }

  /** WALK-FORWARD (rolling-origin) time-series folds with an EMBARGO
    * gap — the temporal cross-validation scheme that [[foldColumn]]'s
    * hash folds must never be used for: with autocorrelated data, a
    * random fold assignment trains on the future; walk-forward trains
    * strictly on the past and embargoes a buffer after each origin so
    * label/feature windows straddling the cut cannot leak
    * (the purged/embargoed CV of the quantitative-finance literature,
    * e.g. López de Prado 2018, applied to any event stream).
    *
    * Fold i (0-based) has origin O_i = min(ts) + trainMin + i·step:
    * TRAIN = ts < O_i, TEST = O_i + embargo ≤ ts < O_i + embargo +
    * horizon; rows in [O_i, O_i+embargo) and beyond the horizon join
    * no role for that fold. All arithmetic is int64 (the engine's
    * UTC-nanos event-time contract) — exact in any engine.
    *
    * 100 TB shape: min(ts) is a one-row lazy aggregate folded in by
    * crossJoin (broadcast of one row, never a driver collect); the
    * fold assignment is a literal-array explode (fan-out = nFolds) on
    * an already-filtered stream — one narrow pass, no shuffle beyond
    * the caller's sink.
    *
    * @return input rows exploded to (fold, role) memberships,
    *         role ∈ {train, test}
    */
  def walkForwardFolds(
      df: DataFrame,
      tsCol: String,
      nFolds: Int,
      trainMin: Long,
      step: Long,
      horizon: Long,
      embargo: Long = 0L): DataFrame = {
    require(nFolds >= 1 && trainMin > 0 && step > 0 && horizon > 0 &&
      embargo >= 0, "walkForwardFolds: spans must be positive")
    val t0 = df.agg(min(col(tsCol)).as("__t0"))
    val ts = col(tsCol)
    df.crossJoin(broadcast(t0))
      .withColumn("__fold", explode(array((0 until nFolds).map(lit): _*)))
      .withColumn("__origin",
        col("__t0") + lit(trainMin) + col("__fold").cast("long") * lit(step))
      .withColumn("role",
        when(ts < col("__origin"), lit("train"))
          .when(ts >= col("__origin") + lit(embargo) &&
            ts < col("__origin") + lit(embargo) + lit(horizon), lit("test")))
      .where(col("role").isNotNull)
      .withColumn("fold", col("__fold").cast("long"))
      .drop("__t0", "__fold", "__origin")
  }
}
