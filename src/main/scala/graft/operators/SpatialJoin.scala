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

  /** Deterministic grid-blocked DBSCAN (Ester et al., KDD'96 — public
    * algorithm) — density clustering from the SAME grid-pigeonholed
    * radius join as [[radiusSelfPairs]], so the neighbor search never
    * goes all-pairs: a point with ≥ minPts points within `radius`
    * (ITSELF INCLUDED, the paper's counting) is a CORE point; clusters
    * are the connected components of the core-core neighbor graph
    * (labels = smallest member id via [[Dedup.connectedComponents]]'
    * pointer jumping); non-core points with a core neighbor are BORDER
    * points. Textbook DBSCAN assigns a border point touching two
    * clusters by scan order — this operator assigns the SMALLEST
    * cluster label instead, making the output a pure function of the
    * input (engine-replayable, partitioning-independent). Everything
    * else is unchanged DBSCAN semantics.
    *
    * Plan: radius pairs (bucketed equi-join) → degree count → core
    * flag → CC on the core-core subgraph (pair-sized, not
    * corpus-sized) → one min-label aggregation for borders → one
    * left-join pass labeling every input point. No collects, no
    * global windows.
    *
    * @return (id, kind ∈ {core, border, noise}, cluster) — cluster is
    *         the smallest core id of the cluster, null for noise
    */
  def dbscan(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long,
      minPts: Int,
      maxCellSize: Int = 100000): DataFrame = {
    require(minPts >= 1, "minPts >= 1")
    val pairs = radiusSelfPairs(points, idCol, xCol, yCol, radius,
        maxCellSize)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true) // consumed 3x: degree, core edges, border
    val adj = pairs.union(pairs.select(col("id_b"), col("id_a")))
      .toDF("id", "nb")
    val deg = adj.groupBy(col("id")).agg(count(lit(1)).as("__nb"))
    val ids = points.select(col(idCol).as("id"))
      .where(col("id").isNotNull)
    val flagged = ids.join(deg, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("__nb"), lit(0L)) + 1L >= minPts).as("__core"))
    val coreIds = flagged.where(col("__core")).select(col("id"))
    val coreEdges = pairs
      .join(coreIds.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(coreIds.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    val cc = Dedup.connectedComponents(coreEdges) // (id, group_id)
    // singleton cores (no core neighbor) keep their own id as label
    val coreLabel = coreIds.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("group_id"), col("id")).as("__cl"))
    // border candidates: min core-neighbor cluster per point
    val borderLabel = adj
      .join(coreLabel.select(col("id").as("nb"), col("__cl")), Seq("nb"))
      .groupBy(col("id")).agg(min(col("__cl")).as("__bl"))
    flagged
      .join(coreLabel, Seq("id"), "left")
      .join(borderLabel, Seq("id"), "left")
      .select(col("id"),
        when(col("__core"), "core")
          .when(col("__bl").isNotNull, "border")
          .otherwise("noise").as("kind"),
        when(col("__core"), col("__cl"))
          .otherwise(col("__bl")).as("cluster"))
  }
}
