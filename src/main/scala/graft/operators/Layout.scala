package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (z-order) clustering keys and
  * zone-map pruning arithmetic — the "which files does this box query
  * touch?" machinery behind every lakehouse OPTIMIZE ZORDER BY. A
  * 100 TB table pruned by parquet row-group min/max stats reads only
  * the zones whose (min,max) box overlaps the predicate; interleaving
  * the bits of the filter columns into the sort/partition key is what
  * makes BOTH columns selective at once (a single-column sort makes
  * zone maps useless for the other column).
  *
  * 100 TB design notes:
  *  - [[zValue]] is pure narrow integer arithmetic (shift/and/add —
  *    whole-stage codegen, no UDF), usable as a `repartitionByRange` /
  *    bucketed-write key directly.
  *  - [[zoneProfile]] derives zones by VALUE RANGE (`z >> zoneShift` =
  *    quadtree cells), not by global rank: no global sort is needed to
  *    assign zones, so profiling is one map-side-combined aggregation.
  *  - [[boxScan]] runs entirely on zone grain (rows ≈ number of files),
  *    reporting zones/rows touched vs matched — the planner-side
  *    arithmetic, measurable and oracle-replayable, with no actual
  *    data movement.
  */
object Layout {

  /** Morton interleave of two non-negative coordinates, `bits` bits
    * each: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Out-of-domain inputs (negative or ≥ 2^bits) raise — a silently
    * truncated coordinate would corrupt the layout, the one thing a
    * clustering key must never do.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val lim = 1L << bits
    def checked(c: Column, side: String) =
      when(c < 0L || c >= lim,
        raise_error(concat(lit(s"zValue: $side out of [0, $lim): "), c.cast("string"))))
        .otherwise(c)
    val xc = checked(x.cast("long"), "x")
    val yc = checked(y.cast("long"), "y")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(xc, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(yc, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Per-zone min/max of both coordinates + row count — the zone map a
    * columnar reader gets for free from row-group stats. `zoneCol` is
    * any integer zone id (e.g. `zValue(...) >> zoneShift` for z-order
    * cells, or an ingestion-order bucket for the unclustered
    * baseline).
    */
  def zoneProfile(df: DataFrame, zoneCol: Column, xCol: String,
      yCol: String): DataFrame =
    df.groupBy(zoneCol.as("zone"))
      .agg(min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"),
        count(lit(1)).as("n_rows"))

  /** Zone-map pruning arithmetic for the box query
    * `x ∈ [x0,x1] ∧ y ∈ [y0,y1]` over a [[zoneProfile]]: one row with
    * total zones/rows, zones/rows TOUCHED (zone box overlaps the query
    * box — what a pruned scan must read). Touched is computed from
    * min/max only, exactly like a reader's row-group skip decision.
    */
  def boxScan(zones: DataFrame, x0: Long, x1: Long, y0: Long,
      y1: Long): DataFrame = {
    val overlaps = !(col("max_x") < x0 || col("min_x") > x1 ||
      col("max_y") < y0 || col("min_y") > y1)
    zones.agg(
      count(lit(1)).as("n_zones"),
      coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
      coalesce(sum(when(overlaps, 1L).otherwise(0L)), lit(0L)).as("zones_touched"),
      coalesce(sum(when(overlaps, col("n_rows")).otherwise(0L)), lit(0L))
        .as("rows_touched"))
  }

  /** Sort-ordered compaction planning (the OPTIMIZE/bin-pack step of a
    * lakehouse table): within each partition, files are walked in
    * `orderCol` order and packed greedily — a bin closes as soon as it
    * reaches `targetBytes`, so every bin except a partition's last
    * holds ≥ target (and < target + the largest file) bytes. Returns
    * one row per planned output file: partition cols + `(bin, n_files,
    * bytes, fill_ppm)`.
    *
    * Bin assignment is pure prefix arithmetic — `bin = (cumulative
    * bytes before this file) div target` — so the plan is a
    * deterministic function of the listing, replayable on any engine
    * (bin ids are byte offsets div target: a file larger than the
    * target owns bins alone and id gaps after it are intentional).
    *
    * 100 TB posture: the input is the FILE LISTING, metadata grain
    * (~1e6 rows for 100 TB of 128 MB files), not data; the per-
    * partition window sorts only each partition's listing slice, and
    * the report is bin grain. The data movement this plan prescribes
    * is the expensive part — planning it is one window pass.
    *
    * `orderCol` ties collapse into one prefix step (RANGE frame): tied
    * files land in the same bin deterministically on every engine —
    * keep the order key unique per partition for strict greedy packing.
    */
  def compactionPlan(files: DataFrame, partitionCols: Seq[String],
      orderCol: String, sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1L, s"targetBytes must be positive, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol).asc)
    files
      .withColumn("__ly_cum", sum(col(sizeCol).cast("long")).over(w))
      .withColumn("bin", expr(s"(__ly_cum - `$sizeCol`) div $targetBytes"))
      .groupBy(partitionCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol).cast("long")).as("bytes"))
      .withColumn("fill_ppm", expr(s"(bytes * 1000000) div $targetBytes"))
  }
}
