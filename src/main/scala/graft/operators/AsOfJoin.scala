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
    * @return left ids with the matched right id (null if no right row
    *         at or before the left ts): (left_id, as_of_id)
    */
  def latestAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(idCol).as("id"), lit(1).as("side"))
    val r = right.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(idCol).as("id"), lit(0).as("side"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("side").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("as_of_id",
        last(when(col("side") === 0, col("id")), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("id").as("left_id"), col("as_of_id"))
  }
}
