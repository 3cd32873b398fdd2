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
      tolerance: Long = -1L): DataFrame =
    asOf(left, right, keyCol, tsCol, idCol, tolerance, forward = false)

  /** FORWARD as-of: the single EARLIEST right row with `right.ts >=
    * left.ts` per key ("next signal at or after event time" — pandas
    * merge_asof direction='forward'). Same one-pass union+window plan,
    * traversed in reverse time order. Determinism mirror: among
    * equal-ts right rows the LOWEST id wins (oracle: `ORDER BY ts ASC,
    * id ASC LIMIT 1`).
    */
  def nextAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      tolerance: Long = -1L): DataFrame =
    asOf(left, right, keyCol, tsCol, idCol, tolerance, forward = true)

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      tolerance: Long,
      forward: Boolean): DataFrame = {
    require(tolerance >= -1L,
      s"tolerance is a non-negative distance (-1 = unbounded), got $tolerance")
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(idCol).as("id"), lit(1).as("side"))
    val r = right.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(idCol).as("id"), lit(0).as("side"))
    // backward: ascending time, right-before-left at equal ts, highest
    // equal-ts right id carried last. forward: the exact mirror.
    val ord =
      if (forward) Seq(col("t").desc, col("side").asc, col("id").desc)
      else Seq(col("t").asc, col("side").asc, col("id").asc)
    val w = Window.partitionBy(col("k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.union(r)
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
