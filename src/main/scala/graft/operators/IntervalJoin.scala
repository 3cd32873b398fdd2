package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP self-join (SURVEY §3.3 north-star family — no
  * reference counterpart; the reference is an ML-lib, §3.2): all pairs
  * of rows with the same key
  * whose closed integer intervals [start, end] intersect — transit
  * windows sharing days in flight, sessions overlapping in time,
  * genomic ranges sharing positions. The missing sibling of
  * [[RangeJoin]] (point-in-window): here BOTH sides are intervals.
  *
  * Spark-first implementation (composed from built-ins, no custom
  * strategy): bucketed equi-join with CREDIT-BUCKET dedup. Each
  * interval explodes to the `bucketSize`-grain buckets it touches, so
  * two overlapping intervals share at least one bucket and the
  * candidate join is a plain equi-join on (key, bucket). A long pair
  * of intervals shares MANY buckets; instead of a `distinct` shuffle
  * over the pair list, each candidate is counted only in its "credit
  * bucket" — the bucket containing max(start_a, start_b), which every
  * overlapping pair has exactly one of. Dedup costs a codegen'd filter,
  * not an exchange.
  *
  * 100 TB posture: one explode (fan-out ≤ len/bucketSize + 1 — size
  * `bucketSize` at or above the typical interval length to keep it
  * ~2), one shuffle per side on (key, bucket), then narrow filter.
  * A (key, bucket) cell with m intervals yields m² candidates — the
  * classic temporal-join hot cell; `bucketSize` is the dial (smaller
  * buckets spread dense periods across more cells) and AQE's skew-join
  * splits what remains. No range-scan, no per-row probes, no
  * Cartesian.
  */
object IntervalJoin {

  /** Overlapping pairs (id_a < id_b) of same-key closed intervals.
    *
    * @param df        input; one interval per row
    * @param keyCol    partition key (pairs never cross keys)
    * @param idCol     unique row id (any orderable type)
    * @param startCol  interval start, integer grain (e.g. epoch days)
    * @param endCol    interval end, inclusive; rows with end < start
    *                  are dropped (empty interval)
    * @param bucketSize  candidate-bucket width in the interval's unit
    * @param maxBucketsPerInterval  fan-out ceiling: an interval
    *        touching MORE than this many buckets RAISES a pointed error
    *        instead of letting one open-ended sentinel row (end =
    *        Long.MaxValue) or a bucketSize orders below the interval
    *        grain materialize a billion-element sequence and OOM
    * @return (keyCol, id_a, id_b, overlap) where overlap =
    *         min(end) - max(start) + 1 ≥ 1 shared grain units
    */
  def selfOverlapPairs(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      startCol: String,
      endCol: String,
      bucketSize: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    val iv = bucketize(df, keyCol, idCol, startCol, endCol,
      bucketSize, maxBucketsPerInterval)
    joinBuckets(sided(iv, "a"), sided(iv, "b"), bucketSize, selfPairs = true)
      .select(col("k").as(keyCol), col("id_a"), col("id_b"), col("overlap"))
  }

  /** TWO-TABLE interval-overlap join: every (left, right) pair of
    * same-key intervals that intersect — "shipments in flight during
    * the order's opening window", "sessions overlapping an incident".
    * Identical bucket/credit machinery to [[selfOverlapPairs]]; both
    * inputs use the same column names.
    *
    * @return (keyCol, left_id, right_id, overlap)
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      idCol: String,
      startCol: String,
      endCol: String,
      bucketSize: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    val a = sided(bucketize(left, keyCol, idCol, startCol, endCol,
      bucketSize, maxBucketsPerInterval), "a")
    val b = sided(bucketize(right, keyCol, idCol, startCol, endCol,
      bucketSize, maxBucketsPerInterval), "b")
    joinBuckets(a, b, bucketSize, selfPairs = false)
      .select(col("k").as(keyCol), col("id_a").as("left_id"),
        col("id_b").as("right_id"), col("overlap"))
  }

  /** Suffix a bucketized relation's id/s/e for one join side. */
  private def sided(iv: DataFrame, side: String): DataFrame =
    iv.select(col("k"), col("bucket"), col("id").as(s"id_$side"),
      col("s").as(s"s_$side"), col("e").as(s"e_$side"))

  /** One interval per (bucket it touches): (k, bucket, id, s, e), with
    * the fan-out guard raising on open-ended sentinel rows. */
  private def bucketize(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      startCol: String,
      endCol: String,
      bucketSize: Long,
      maxBucketsPerInterval: Int): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val bLo = expr(s"s div $bucketSize")
    val bHi = expr(s"e div $bucketSize")
    df.select(col(keyCol).as("k"), col(idCol).as("id"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .where(col("s") <= col("e"))
      // try_subtract: a (Long.MinValue, Long.MaxValue) double-sentinel
      // row overflows the span subtraction — NULL here (ANSI would
      // throw its own opaque ARITHMETIC_OVERFLOW, non-ANSI would wrap
      // negative and slip past the guard), and NULL falls to the
      // pointed raise below in BOTH modes
      .withColumn("bucket", explode(sequence(bLo,
        when(expr(s"try_subtract(e div $bucketSize, s div $bucketSize)")
            < maxBucketsPerInterval, bHi)
          .otherwise(raise_error(
          concat(lit("IntervalJoin: interval ["), col("s").cast("string"),
            lit(", "), col("e").cast("string"),
            lit(s"] spans > $maxBucketsPerInterval buckets at " +
              s"bucketSize=$bucketSize; raise bucketSize (or " +
              "maxBucketsPerInterval) to match the interval grain"))
          ).cast("long")))))
  }

  /** Candidate equi-join + exact predicate + credit-bucket dedup (the
    * pair is counted only in the bucket where its overlap starts, so no
    * distinct exchange is ever needed). `selfPairs` adds the id_a <
    * id_b canonicalization a self-join needs. */
  private def joinBuckets(
      a: DataFrame, b: DataFrame, bucketSize: Long, selfPairs: Boolean): DataFrame = {
    val base = a.join(b, Seq("k", "bucket"))
      .where(col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
        col("bucket") === expr(s"greatest(s_a, s_b) div $bucketSize"))
    (if (selfPairs) base.where(col("id_a") < col("id_b")) else base)
      .withColumn("overlap",
        least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")) + 1)
  }

  /** Merge same-key closed intervals whose gap is ≤ `maxGap` into their
    * union spans (interval coalescing — flattening validity windows,
    * activity periods, reservations into disjoint coverage). Returns
    * one row per merged span: `(keyCol, start, end, n_merged)`.
    * `maxGap = 0` merges only overlapping/touching intervals
    * ([1,3]+[3,5] share the point 3); `maxGap = 1` also merges
    * integer-adjacent ones ([1,3]+[4,5]). Empty intervals (end <
    * start) are dropped before merging.
    *
    * Classic sweep, declaratively: per key sorted by (start, end, id),
    * a span breaks where start exceeds the running max end of all
    * EARLIER intervals (the exclusive-prefix max — an interval nested
    * inside a long predecessor must not split it) by more than
    * `maxGap`; the cumulative break count is the span id. Both windows
    * share one partition+sort, so the whole merge is ONE shuffle on
    * the key and two in-partition passes, then a map-side-combined
    * aggregation at span grain. The per-key interval count bounds the
    * window partition — same posture as [[Sessionize]].
    */
  def coalesceIntervals(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      startCol: String,
      endCol: String,
      maxGap: Long = 0L): DataFrame = {
    require(maxGap >= 0L, s"maxGap must be >= 0, got $maxGap")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc, col(endCol).asc, col(idCol).asc)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(W.unboundedPreceding, -1))
    df.where(col(endCol) >= col(startCol))
      .withColumn("__iv_brk",
        when(prevMax.isNull || col(startCol) > prevMax + maxGap, 1L)
          .otherwise(0L))
      .withColumn("__iv_grp",
        sum(col("__iv_brk")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy(col(keyCol), col("__iv_grp"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__iv_grp")
  }
}
