package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Deduplication operator family for the LLM-data-pipeline surface
  * (SURVEY.md §3.3): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * 100 TB design notes (applies to every member):
  *  - No driver-side data. Candidate generation is always a
  *    bucket-equi-join (shuffle on a small bucket key), never a cross
  *    join; pair verification happens only inside buckets.
  *  - Quadratic blow-up inside a hot bucket is the real skew risk at
  *    scale — `maxBucketSize` drops degenerate buckets (boilerplate
  *    strings hashing together) with an explicit, logged cap rather than
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

  /** MinHash signature: for hash function s, min over shingles of
    * xxhash64(shingle, s). `numHashes` seeded hashes, as one
    * `array<bigint>` column — pure Catalyst, no UDF.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    F.transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(F.transform(shingles, sh => xxhash64(sh, s))))

  /** LSH band keys: signature split into `numBands` bands of
    * `rowsPerBand`, each band hashed to one bigint bucket key.
    */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    F.transform(sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

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
    val sh = TextFunctions.shingles(col(textCol), shingleSize)
    val withSig = df
      .select(col(idCol).as("id"), sh.as("sh"))
      .withColumn("bands", bandKeys(minhashSignature(col("sh"), numHashes), numBands, rowsPerBand))
      .select(col("id"), col("sh"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))

    // degenerate-bucket cap (skew guard — see object doc)
    val bucketed = withSig
      .withColumn("bsz", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_hash"))))
      .where(col("bsz") <= maxBucketSize)
      .drop("bsz")

    val a = bucketed.select(col("band_idx"), col("band_hash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = bucketed.select(col("band_idx"), col("band_hash"),
      col("id").as("id_b"), col("sh").as("sh_b"))

    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }

  /** 64-bit SimHash over whitespace tokens (frequency-weighted bit vote).
    * Pure Catalyst: per-bit vote via `aggregate` over token hashes,
    * `call_function` for column-indexed shifts.
    */
  def simhash64(text: Column): Column = {
    val th = F.transform(TextFunctions.tokens(text), t => xxhash64(t))
    val bits = F.transform(sequence(lit(0), lit(63)), j =>
      when(
        aggregate(th, lit(0),
          (acc, h) => acc +
            when(call_function("shiftright", h, j).bitwiseAND(lit(1L)) === 1L, 1)
              .otherwise(-1)) > 0,
        lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)),
        (b, j) => call_function("shiftleft", b, j)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
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
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-block pigeonhole guarantees recall only for maxDist <= 3")
    val sim = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val blocks = sim.select(col("id"), col("sim"),
      posexplode(F.transform(sequence(lit(0), lit(3)),
        i => call_function("shiftright", col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("block_idx", "block_val")))
    val a = blocks.select(col("block_idx"), col("block_val"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = blocks.select(col("block_idx"), col("block_val"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("block_idx", "block_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for pairs that share a cheap blocking
    * key (first shingle hash mod buckets + length band) — exact verify on
    * candidates only, never all-pairs.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = TextFunctions.shingles(col(textCol), n)
    // blocking key: min shingle hash — two docs with Jaccard >= t share
    // their min-hashed shingle with probability >= t (1-hash MinHash)
    val d = df.select(col(idCol).as("id"), sh.as("sh"))
      .withColumn("block", array_min(F.transform(col("sh"), s => xxhash64(s))))
    val a = d.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = d.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }
}
