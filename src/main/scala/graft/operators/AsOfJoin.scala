package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single most
  * recent right row with `right.ts <= left.ts` within the same key —
  * the operator behind feature lookups ("latest signal as of event
  * time") that Spark has no built-in for.
  *
  * Spark-first implementation (preference (a): composed from built-in
  * ops): UNION the two sides tagged, then ONE window pass per key
  * ordered by (ts, side, id) carrying the last-seen right id forward
  * (`last(..., ignoreNulls)` over rows-unbounded-preceding). Cost = one
  * shuffle on the key + one sort — no range join, no per-row probes, no
  * correlated anything; scales as a single sort-merge pass regardless
  * of time-density skew.
  *
  * Determinism: right rows sort before left rows at equal ts (inclusive
  * match), and among equal-ts right rows the HIGHEST id wins (sorted
  * ascending, last carried) — mirrored exactly by the DuckDB oracle's
  * `ORDER BY ts DESC, id DESC LIMIT 1`.
  */
object AsOfJoin {

  /** @param left      rows to enrich; columns (keyCol, tsCol, idCol)
    * @param right     lookup side; columns (keyCol, tsCol, idCol)
    * @param tolerance  max allowed match DISTANCE (always non-negative:
    *                   left.ts − right.ts here, right.ts − left.ts for
    *                   [[nextAsOf]]) in the ts unit; −1 (the default) =
    *                   unbounded — pandas merge_asof's `tolerance`.
    *                   Other negative values are rejected, not silently
    *                   unbounded.
    * @param allowExactMatches  false = strict inequality (right.ts <
    *                   left.ts), pandas merge_asof's flag of the same
    *                   name. Implemented purely in the SORT: left rows
    *                   order BEFORE equal-ts right rows, so the carried
    *                   last-right value a left row sees predates its ts
    *                   strictly — no extra pass, no filter.
    * @return left ids with the matched right id (null if no right row
    *         at or before the left ts, or none within tolerance):
    *         (left_id, as_of_id)
    */
  def latestAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      tolerance: Long = -1L,
      allowExactMatches: Boolean = true): DataFrame =
    asOf(left, right, keyCol, tsCol, idCol, tolerance, forward = false,
      allowExactMatches)

  /** FORWARD as-of: the single EARLIEST right row with `right.ts >=
    * left.ts` per key ("next signal at or after event time" — pandas
    * merge_asof direction='forward'; `allowExactMatches = false` makes
    * it strictly after). Same one-pass union+window plan, traversed in
    * reverse time order. Determinism mirror: among equal-ts right rows
    * the LOWEST id wins (oracle: `ORDER BY ts ASC, id ASC LIMIT 1`).
    */
  def nextAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      tolerance: Long = -1L,
      allowExactMatches: Boolean = true): DataFrame =
    asOf(left, right, keyCol, tsCol, idCol, tolerance, forward = true,
      allowExactMatches)

  /** NEAREST as-of (pandas merge_asof direction='nearest'): per left
    * row, whichever of the backward and forward candidates sits closer
    * in time; on an exact distance TIE the BACKWARD match wins (pandas'
    * rule). Implemented as the same tagged union with BOTH carried
    * window passes — one shuffle on the key, two in-partition sorts, no
    * join of two as-of outputs. With `allowExactMatches = false` an
    * equal-ts right row is invisible to both directions.
    */
  def nearestAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      tolerance: Long = -1L,
      allowExactMatches: Boolean = true): DataFrame = {
    require(tolerance >= -1L,
      s"tolerance is a non-negative distance (-1 = unbounded), got $tolerance")
    val u = tagged(left, right, keyCol, tsCol, idCol)
    val wB = carryWindow(forward = false, allowExactMatches)
    val wF = carryWindow(forward = true, allowExactMatches)
    val carried = u
      .withColumn("__bid",
        last(when(col("side") === 0, col("id")), ignoreNulls = true).over(wB))
      .withColumn("__bts",
        last(when(col("side") === 0, col("t")), ignoreNulls = true).over(wB))
      .withColumn("__fid",
        last(when(col("side") === 0, col("id")), ignoreNulls = true).over(wF))
      .withColumn("__fts",
        last(when(col("side") === 0, col("t")), ignoreNulls = true).over(wF))
      .where(col("side") === 1)
    val distB = col("t") - col("__bts")
    val distF = col("__fts") - col("t")
    val bOk = col("__bid").isNotNull &&
      (if (tolerance < 0) lit(true) else distB <= tolerance)
    val fOk = col("__fid").isNotNull &&
      (if (tolerance < 0) lit(true) else distF <= tolerance)
    // tie rule: distB <= distF prefers backward, the pandas contract
    val matched = when(bOk && (!fOk || distB <= distF), col("__bid"))
      .when(fOk, col("__fid"))
    carried.select(col("id").as("left_id"), matched.as("as_of_id"))
  }

  /** Tagged union of the two sides: (k, t, id, side 0=right 1=left). */
  private def tagged(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String): DataFrame =
    left.select(col(keyCol).as("k"), col(tsCol).as("t"),
        col(idCol).as("id"), lit(1).as("side"))
      .union(right.select(col(keyCol).as("k"), col(tsCol).as("t"),
        col(idCol).as("id"), lit(0).as("side")))

  /** The carry window for one direction. backward: ascending time,
    * right-before-left at equal ts (inclusive) or left-before-right
    * (strict), highest equal-ts right id carried last. forward: the
    * exact mirror. The inclusive/strict choice is PURELY this sort
    * order — the scan itself never changes.
    */
  private def carryWindow(forward: Boolean, allowExactMatches: Boolean) = {
    val side = if (allowExactMatches) col("side").asc else col("side").desc
    val ord =
      if (forward) Seq(col("t").desc, side, col("id").desc)
      else Seq(col("t").asc, side, col("id").asc)
    Window.partitionBy(col("k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      tolerance: Long,
      forward: Boolean,
      allowExactMatches: Boolean): DataFrame = {
    require(tolerance >= -1L,
      s"tolerance is a non-negative distance (-1 = unbounded), got $tolerance")
    val w = carryWindow(forward, allowExactMatches)
    val carried = tagged(left, right, keyCol, tsCol, idCol)
      .withColumn("__mid",
        last(when(col("side") === 0, col("id")), ignoreNulls = true).over(w))
      .withColumn("__mts",
        last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
      .where(col("side") === 1)
    val dist = if (forward) col("__mts") - col("t") else col("t") - col("__mts")
    val matched =
      if (tolerance < 0) col("__mid")
      else when(dist <= tolerance, col("__mid"))
    carried.select(col("id").as("left_id"), matched.as("as_of_id"))
  }
}
