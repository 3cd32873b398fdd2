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

  /** Key-skew diagnostic — the report a pipeline runs on a join/groupBy
    * key BEFORE committing to a plan (feeds [[SkewJoin]]'s salting
    * decision): the `topK` heaviest keys (count desc, key asc) each
    * with its row share in exact ppm, plus the per-key-count
    * distribution (n_keys, total_rows, max_cnt and the p50/p90/p99
    * discrete percentiles of the count-per-key).
    *
    * 100 TB design notes:
    *  - Per-key counts are ONE map-side-combined shuffle; every later
    *    stage runs on aggregate grain.
    *  - Heavy keys use the bounded [[TopKAgg]] aggregate (O(k) state,
    *    no WindowExec over the key table).
    *  - Percentiles come from the frequency-of-frequencies table
    *    (distinct count values): its global cumulative window is
    *    provably bounded — m distinct count values need
    *    m·(m+1)/2 ≤ total_rows rows, so m ≤ √(2·total_rows)
    *    (~1.4M rows at 10^12 input rows — a single partition holds it).
    *  - Boundary rule is integer-exact percentile_disc: the smallest
    *    count c with 100·|{keys: cnt ≤ c}| ≥ p·n_keys.
    *
    * The key must cast losslessly to bigint ([[TopKAgg]]'s id slot);
    * hash non-numeric keys to 64 bits first.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val glob = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      TopKAgg.topK(col("cnt").cast("double"), col("key"), topK).as("top"))
    val freq = counts.groupBy(col("cnt")).agg(count(lit(1)).as("n_at"))
    val cum = freq.withColumn("cum_keys",
      sum(col("n_at")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    def bound(p: Int) =
      min(when(col("cum_keys") * 100 >= col("n_keys") * p, col("cnt")))
        .as(s"p${p}_cnt")
    val bounds = cum.crossJoin(broadcast(glob.select(col("n_keys"))))
      .agg(bound(50), bound(90), bound(99))
    glob.crossJoin(broadcast(bounds))
      .select(col("n_keys"), col("total_rows"), col("max_cnt"),
        col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
        posexplode(col("top")).as(Seq("pos", "p")))
      .select(
        (col("pos") + 1).cast("long").as("rank"),
        col("p.id").as("key"),
        col("p.val").cast("long").as("cnt"),
        expr("(CAST(p.val AS BIGINT) * 1000000) div total_rows").as("share_ppm"),
        col("n_keys"), col("total_rows"), col("max_cnt"),
        col("p50_cnt"), col("p90_cnt"), col("p99_cnt"))
  }
}
