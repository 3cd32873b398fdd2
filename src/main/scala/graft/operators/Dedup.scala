package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Deduplication operator family for the LLM-data-pipeline surface
  * (SURVEY.md §3.3): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup (the latter in [[Similarity]]).
  *
  * 100 TB design notes (applies to every member):
  *  - No driver-side data. Candidate generation is always a
  *    bucket-equi-join (shuffle on a small bucket key), never a cross
  *    join; pair verification happens only inside buckets.
  *  - Signatures are computed in the EXPLODE → GROUP BY shape: shingle/
  *    token rows are materialized once, then the 64 min/sum aggregates
  *    run with map-side partial aggregation. The tempting all-expression
  *    form (`transform(sequence(0,63), s -> array_min(...))` over a
  *    shingle-array column) is quadratic in practice: Catalyst's
  *    projection collapse inlines the tokenize→shingle pipeline into
  *    every one of the 64 lambdas (and again into every band), turning
  *    one tokenization per row into hundreds — measured 100× slower at
  *    5k docs and unbounded at scale.
  *  - Quadratic blow-up inside a hot bucket is the real skew risk at
  *    scale — `maxBucketSize` drops degenerate buckets (boilerplate
  *    strings hashing together) with an explicit cap rather than
  *    letting one bucket OOM an executor. AQE skew-join handles the rest.
  *  - All hash functions are seeded xxhash64 (codegen'd, 64-bit) —
  *    deterministic across runs and partitionings.
  */
object Dedup {

  /** Exact dedup: canonical survivor per duplicate group = lowest id.
    * One shuffle on the (hashed) key; `row_number` over a window keyed by
    * the group — at scale this is the standard hash-partitioned
    * first-per-group, no skew beyond the duplicate-group distribution.
    */
  def exact(df: DataFrame, keyCols: Seq[Column], idCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(idCol.asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-id shingle set + MinHash signature in ONE aggregation pass:
    * (id, shingle) rows → groupBy(id) with `numHashes` partial `min`
    * aggregates (signature position s = min over shingles of
    * xxhash64(shingle, s)) plus `collect_set` for the exact-verify set.
    * Shuffle volume = one row per (id, distinct shingle), combined
    * map-side to one row per id.
    */
  private[operators] def shingleSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      numHashes: Int): DataFrame = {
    val rows = df.select(col(idCol).as("id"),
      explode(TextFunctions.shingles(col(textCol), shingleSize)).as("shingle"))
    val mins = (0 until numHashes).map(s =>
      min(xxhash64(col("shingle"), lit(s))).as(s"__h$s"))
    val aggs = collect_set(col("shingle")).as("sh") +: mins
    rows.groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), col("sh"),
        array((0 until numHashes).map(s => col(s"__h$s")): _*).as("sig"))
  }

  /** LSH band keys over a materialized signature: split into `numBands`
    * bands of `rowsPerBand`, each band hashed to one bigint bucket key.
    */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    F.transform(sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** Degenerate-bucket cap (skew guard — see object doc). */
  private def capBuckets(df: DataFrame, maxBucketSize: Int): DataFrame =
    df.withColumn("__bsz", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_hash"))))
      .where(col("__bsz") <= maxBucketSize)
      .drop("__bsz")

  private def verifiedJaccardPairs(
      blocked: DataFrame,
      threshold: Double): DataFrame = {
    val a = blocked.select(col("band_idx"), col("band_hash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("band_idx"), col("band_hash"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }

  /** MinHash+LSH near-duplicate candidate pairs with exact-Jaccard
    * verification (shingle → minhash → band → bucket-join, SURVEY §3.3).
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold. Probability two docs share >=1 band is
    * 1-(1-j^r)^b — defaults (64 hashes, 16 bands × 4 rows) catch
    * j >= 0.7 with ~98% recall.
    */
  def minhashLSH(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      numBands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sigs = shingleSignatures(df, idCol, textCol, shingleSize, numHashes)
    val withBands = sigs.select(col("id"), col("sh"),
      posexplode(bandKeys(col("sig"), numBands, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))
    verifiedJaccardPairs(capBuckets(withBands, maxBucketSize), threshold)
  }

  /** 64-bit SimHash per document (frequency-weighted bit vote), in the
    * explode → groupBy shape: token-hash rows → 64 partial `sum` votes →
    * bit assembly. Documents with zero tokens are excluded (nothing to
    * compare; also prevents the all-zero simhash from forming one giant
    * candidate bucket).
    */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"__v$j")
    }
    tok.groupBy(col("id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map { j =>
          when(col(s"__v$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _).as("sim"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist.
    * Pigeonhole blocking: 4 blocks of 16 bits — any pair within distance
    * <= 3 shares at least one exact block; bucket-join on (block idx,
    * block value), verify with bit_count(xor). maxDist <= 3 keeps the
    * 4-block guarantee.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(maxDist <= 3, "4-block pigeonhole guarantees recall only for maxDist <= 3")
    val sim = simhashes(df, idCol, textCol)
    val blocks = sim.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_idx", "band_hash")))
    val capped = capBuckets(blocks, maxBucketSize)
    val a = capped.select(col("band_idx"), col("band_hash"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = capped.select(col("band_idx"), col("band_hash"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity over blocked candidates: `numBlocks`
    * INDEPENDENT seeded min-hash blocking keys (each key = min over
    * shingles of xxhash64(shingle, seed_b)), candidates = pairs sharing
    * any key, then exact Jaccard verification on candidates only — never
    * all-pairs. A single min-hash finds a Jaccard-j pair with probability
    * j (~50% misses at j = 0.5); with B independent blocks recall is
    * 1-(1-j)^B — defaults (B=8) give >= 99.6% at j >= 0.5.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      numBlocks: Int = 8,
      maxBucketSize: Int = 1000): DataFrame = {
    val sigs = shingleSignatures(df, idCol, textCol, n, numBlocks)
    val blocked = sigs.select(col("id"), col("sh"),
      posexplode(col("sig")).as(Seq("band_idx", "band_hash")))
    verifiedJaccardPairs(capBuckets(blocked, maxBucketSize), threshold)
  }
}
