package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical encoding for feature prep: a deterministic dense label
  * dictionary (code 0 = most frequent, ties by value ASC — the
  * frequency ordering every embedding-table builder wants, so code
  * ranges double as popularity ranges) and the join-based encode pass.
  *
  * 100 TB shape: the dictionary is ONE map-side-combined count at
  * vocab grain; the ranking window is unpartitioned but consumes the
  * AGGREGATE (the PlanSpec boundedness rule — a dictionary is by
  * definition vocab-sized, and if the vocab is data-sized you wanted a
  * hash, not a dictionary). Encoding is a plain equi-join the AQE
  * broadcast path collapses for real vocabularies; unseen values (new
  * categories at inference time) encode as NULL, loudly absent rather
  * than silently colliding.
  */
object Encoding {

  /** (value, code, cnt) — dense codes 0..|vocab|−1 by (cnt DESC,
    * value ASC). Null values are EXCLUDED (null is "missing", not a
    * category; impute first if you mean a category).
    */
  def labelDictionary(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("string").as("value"))
      .agg(count(lit(1)).as("cnt"))
    // vocab-grain global window (bounded by the aggregate beneath it)
    vocab.withColumn("code",
        (row_number().over(Window.orderBy(col("cnt").desc, col("value").asc))
          - 1).cast("long"))
      .select(col("value"), col("code"), col("cnt"))
  }

  /** Replace `valueCol` with its dictionary code (null for unseen). */
  def encode(df: DataFrame, valueCol: String, dict: DataFrame): DataFrame =
    df.join(dict.select(col("value").as(s"__enc_$valueCol"), col("code")),
        col(valueCol).cast("string") === col(s"__enc_$valueCol"), "left")
      .drop(valueCol, s"__enc_$valueCol")
      .withColumnRenamed("code", valueCol)

  /** Leave-one-out target encoding — the supervised cousin of
    * [[labelDictionary]]: each row's category is replaced by the mean
    * of the TARGET over the OTHER rows of that category, the standard
    * leakage-free way to feed a high-cardinality categorical to a
    * model (encoding a row with a mean that includes its own target
    * leaks the label; holding the row out removes exactly that bit).
    *
    * Exactness contract (the q72 DECIMAL-sum rule): the target is
    * truncated to the decimal(14,4) exact domain (values at/beyond
    * 1e10 RAISE — an encoding that silently drops the extreme rows
    * would shift every mean), group sums are exact decimals
    * (shuffle-order independent), and the held-out mean is emitted as
    * a floor-e6 integer — `(S − y)·1e6 div (n − 1)` on exact decimal
    * operands, so both engines replay it bit-for-bit with integer
    * division (`div` here, `//` in the oracle; the target must be
    * non-negative for the two floor conventions to agree, which the
    * guard enforces).
    *
    * Row contract: a row with a NON-NULL target in a category with
    * n ≥ 2 non-null targets gets the held-out mean; the only row of
    * its category gets NULL (nothing to borrow — the caller imputes a
    * prior); a NULL-target row (inference time) gets the FULL mean
    * S·1e6 div n over whatever training rows share its category. NULL
    * categories are a category (null-safe grouping), mirroring
    * [[graft.operators.Stats]]' null-group contract.
    *
    * 100 TB shape: one map-side-combined aggregation to a
    * category-grained sums table, then one narrow join pass back —
    * AQE broadcasts the sums side for real vocabularies, so the data
    * itself never shuffles (the [[graft.operators.Stats.outliers]]
    * two-pass shape, applied to feature prep).
    *
    * @return `df` plus `n_key` (non-null targets in the row's
    *         category) and `loo_e6` (floor-e6 held-out mean)
    */
  def targetEncodeLoo(
      df: DataFrame, keyCol: String, targetCol: String): DataFrame = {
    val raw = col(targetCol)
    val y = coalesce(raw.try_cast("decimal(14,4)"),
      when(raw.isNotNull, raise_error(concat(
        lit(s"Encoding.targetEncodeLoo: $targetCol value "),
        raw.cast("string"),
        lit(" overflows the decimal(14,4) exact-sum domain (0 <= y < " +
          "1e10); rescale the target first")))
        .cast("decimal(14,4)")))
    val guarded = when(y < 0, raise_error(concat(
        lit(s"Encoding.targetEncodeLoo: $targetCol value "), raw.cast("string"),
        lit(" is negative — the floor-division replay contract needs a " +
          "non-negative target; shift the target first")))
        .cast("decimal(14,4)")).otherwise(y)
    // scaled-LONG domain from here on: a wide-decimal (S − y)·1e6
    // product would pass decimal(38) precision and silently ROUND
    // (the exact last-digit drift the operator exists to prevent);
    // fixed-point longs keep every op exact. Bound: Σy·1e6 must fit a
    // long, i.e. a category's target sum stays below ~9.2e12 — beyond
    // that, rescale the target.
    val y4 = (guarded * lit(10000)).cast("long")
    val sums = df.withColumn("__y4g", y4)
      .groupBy(col(keyCol).as("__k"))
      .agg(count(col("__y4g")).as("n_key"), sum(col("__y4g")).as("__s4"))
    df.withColumn("__y4", y4)
      .join(sums, col(keyCol) <=> col("__k"), "left")
      .withColumn("loo_e6",
        when(col("__y4").isNotNull && col("n_key") > 1,
          expr("(__s4 - __y4) * 100L div (n_key - 1)"))
          .when(col("__y4").isNull && col("n_key") > 0,
            expr("__s4 * 100L div n_key")))
      .drop("__k", "__y4", "__s4")
  }

  /** The hashing trick (feature hashing, Weinberger et al. 2009):
    * sparse token features folded into a FIXED `nBuckets`-dimensional
    * space with a signed hash — the vocabulary-free encoder for
    * unbounded token spaces where [[labelDictionary]]'s vocab-sized
    * dictionary stops being a dictionary. bucket = h(token) mod
    * nBuckets; sign = parity of the next hash bit (the signed variant
    * keeps collision noise zero-mean); output is the sparse (id,
    * bucket, weight = Σ sign) triple per document — exactly what a
    * linear model or MinHash-over-features consumer wants.
    *
    * Hash = [[graft.functions.PortableHash.hash60]] (salted md5), the
    * repo's ONE portable hash, so an external engine replays every
    * bucket and sign byte-for-byte. Purely narrow: explode → project →
    * one map-side-combined aggregation at (id, bucket) grain; no
    * vocabulary state, no join, nothing driver-sized — the encoder
    * that needs no fit() is also the one that needs no shuffle beyond
    * its output grain.
    *
    * @param tokensCol array<string> column expression (pre-tokenized —
    *                  tokenization policy stays with the caller)
    */
  def hashFeatures(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      nBuckets: Int,
      salt: String = "feat"): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 24),
      "nBuckets in [2, 16M] (the point of hashing is a SMALL fixed space)")
    val h = graft.functions.PortableHash.hash60(col("__tok"), salt)
    df.select(col(idCol), explode(tokensCol).as("__tok"))
      .withColumn("__h", h)
      .select(col(idCol),
        (col("__h") % nBuckets).as("bucket"),
        // integer div, NOT `/` (Column./ on longs is double division)
        when(expr(s"(__h div ${nBuckets}L) % 2") === 0, 1L).otherwise(-1L)
          .as("__sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sign")).as("weight"))
  }
}
