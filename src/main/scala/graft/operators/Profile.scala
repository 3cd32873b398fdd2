package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling for data-quality gating in ingest pipelines: one
  * row per profiled column with row/null/distinct counts and
  * lexicographic min/max.
  *
  * 100 TB design notes: the table is scanned ONCE — columns are melted
  * to (col_name, value) rows via `unpivot` (a narrow generate, no
  * shuffle), then a single groupBy(col_name) computes every stat with
  * map-side partial aggregation. The tempting per-column
  * `df.agg(...countDistinct(c1), countDistinct(c2)...)` form expands
  * into one Expand branch per distinct aggregate — k× the scan volume
  * through the aggregation — and k separate `df.select(stats)` jobs
  * would scan the table k times. Values profile as strings so one
  * schema fits every column; numeric-typed min/max belong in a typed
  * per-column query, not the generic profiler.
  */
object Profile {

  private def melt(df: DataFrame, cols: Seq[String],
      distinctAgg: org.apache.spark.sql.Column): DataFrame =
    df.unpivot(
        Array.empty,
        cols.map(c => col(c).cast("string").as(c)).toArray,
        "col_name", "value")
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"),
        distinctAgg,
        min(col("value")).as("min_s"),
        max(col("value")).as("max_s"))

  def summarize(df: DataFrame, cols: Seq[String]): DataFrame =
    melt(df, cols, countDistinct(col("value")).as("n_distinct"))

  /** The 100 TB variant: identical shape but HyperLogLog++ distinct
    * counts (`approx_count_distinct`). Exact `countDistinct` rewrites
    * into an Expand + second aggregation keyed by every distinct value —
    * shuffle volume proportional to the column's cardinality, which for
    * an id-like column is the table itself. The HLL sketch is a
    * fixed-size, map-side-mergeable buffer regardless of cardinality.
    * Engine-specific sketch ⇒ not DuckDB-oracle-registrable; its error
    * is bounded by spec instead (ProfileSpec, rsd-based).
    */
  def summarizeApprox(
      df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    melt(df, cols, approx_count_distinct(col("value"), rsd).as("n_distinct_approx"))
}
