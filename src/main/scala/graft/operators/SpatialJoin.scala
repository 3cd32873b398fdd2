package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Radius (distance-threshold) self-join over 2-D points WITHOUT the
  * all-pairs scan: uniform grid blocking. Each point lands in ONE
  * `radius × radius` cell; any pair within `radius` is then guaranteed
  * to sit in the same or an adjacent cell (|Δcell| ≤ 1 per axis — the
  * geometric pigeonhole that makes grid blocking COMPLETE, the spatial
  * twin of [[FuzzyJoin]]'s deletion-neighborhood proof). The left side
  * explodes to its 3×3 neighbor cells and ONE equi-join on the exact
  * cell key collects candidates; the exact integer distance check
  * `dx² + dy² ≤ radius²` scrubs the rest.
  *
  * Coordinates are INT64 in caller units (meters, micro-degrees,
  * whatever) — no floats anywhere, so the oracle replays every pair
  * bit-for-bit, and `radius` up to ~2.1e9 keeps `dx² + dy²` inside a
  * signed 64-bit value (guarded).
  *
  * Dedup-free by construction: a true pair materializes exactly once —
  * under the single neighbor-offset equal to its actual cell delta —
  * so no distinct-exchange over candidates exists (the
  * [[IntervalJoin]] credit-bucket idea on a grid).
  *
  * 100 TB posture: one narrow projection + a 9× integer-key fan-out on
  * the left, ONE equi-join shuffled on the cell key, exact filter
  * inside the join stage; output-bound like every candidate-verify
  * operator here. Hub cells (a city-center key in a sparse-world
  * dataset) raise loudly past `maxCellSize` rather than going
  * quadratic in silence — the guard rides the JOIN KEY projection, so
  * it cannot be pruned away.
  */
object SpatialJoin {

  /** All pairs (id_a < id_b) with squared euclidean distance ≤
    * radius², hydrated with both coordinates and `d2` (the exact
    * squared distance — callers wanting distance units take the sqrt
    * themselves; emitting the square keeps the output integral).
    */
  def radiusSelfPairs(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long,
      maxCellSize: Int = 100000): DataFrame = {
    require(radius >= 1 && radius <= 2100000000L,
      "radius in [1, 2.1e9] keeps dx^2 + dy^2 in int64")
    require(maxCellSize >= 1)
    val rows = points.select(col(idCol).as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .where(col("id").isNotNull && col("x").isNotNull && col("y").isNotNull)
    // floor-division cell key; shift into the positive quadrant first
    // (integer `div` truncates toward zero, which differs from floor
    // for negatives — the 2^61 offset makes every realistic coordinate
    // positive, identically in both engines)
    val off = 1L << 61
    val cells = rows
      .withColumn("cx", expr(s"(x + ${off}L) div ${radius}L"))
      .withColumn("cy", expr(s"(y + ${off}L) div ${radius}L"))
    val sized = cells.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("__csz"))
    val guarded = cells.join(sized, Seq("cx", "cy"))
      // the guard REPLACES cx on the build path: every surviving row's
      // join key evaluates it, so an over-full cell always raises
      .withColumn("cx", when(col("__csz") > maxCellSize, raise_error(concat(
        lit("SpatialJoin: grid cell holds "), col("__csz").cast("string"),
        lit(s" points (> $maxCellSize); a hub cell goes quadratic — " +
          "shrink radius, pre-aggregate the hotspot, or raise the cap " +
          "deliberately")))
        .cast("long")).otherwise(col("cx")))
      .drop("__csz")
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val a = guarded
      .withColumn("__o", explode(array(offsets: _*)))
      .select(col("id").as("id_a"), col("x").as("x_a"), col("y").as("y_a"),
        (col("cx") + col("__o.dx")).as("jx"),
        (col("cy") + col("__o.dy")).as("jy"))
    val b = guarded.select(col("id").as("id_b"), col("x").as("x_b"),
      col("y").as("y_b"), col("cx").as("jx"), col("cy").as("jy"))
    val d2 = (col("x_a") - col("x_b")) * (col("x_a") - col("x_b")) +
      (col("y_a") - col("y_b")) * (col("y_a") - col("y_b"))
    a.join(b, Seq("jx", "jy"))
      .where(col("id_a") < col("id_b"))
      .withColumn("d2", d2)
      .where(col("d2") <= lit(radius) * lit(radius))
      .select(col("id_a"), col("id_b"), col("x_a"), col("y_a"),
        col("x_b"), col("y_b"), col("d2"))
  }
}
