package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics beyond [[Dedup.connectedComponents]]: link-analysis
  * centrality, the web-corpus quality signal (a page's crawl priority /
  * quality prior is classically its PageRank — the importance weighting
  * large-scale corpus pipelines attach to pages before filtering).
  *
  * Everything here is INTEGER-SCALED, fixed-iteration arithmetic:
  * float PageRank is not engine-replayable (per-node inflow is a sum
  * of doubles whose order a distributed groupBy does not fix), so rank
  * carries as a scaled long with floor division — every engine computes
  * bit-identical ranks, and the DuckDB oracle replays whole iterations
  * (q97). The floor makes each division lose < 1 scale unit of mass —
  * a deliberate, documented bias of ~iterations/scale relative rank,
  * invisible at scale = 1e12.
  */
object Graph {

  /** Fixed-iteration PageRank over a DIRECTED unweighted edge list
    * (duplicate edges collapse; pass both directions for an undirected
    * graph). rank_0 = scale for every node;
    *
    *   rank_{i+1}(v) = (scale·(100−dampingPct)) div 100
    *                 + (dampingPct · Σ_{u→v} (rank_i(u) div outdeg(u))) div 100
    *
    * Dangling nodes (no out-edges) leak their damped mass each pass —
    * the standard simplification; add self-loops or reverse edges if
    * conservation matters.
    *
    * Overflow is LOUD, never silent: total mass is ≤ n·scale, so the
    * worst intermediate (dampingPct · inflow) needs
    * n · scale · dampingPct < 2^63 — the default scale=1e12 is safe to
    * ~10^5 nodes, scale=1e9 to ~10^8; beyond that pass a smaller scale.
    * Both Spark (ANSI) and the oracle raise on a 64-bit overflow rather
    * than wrapping.
    *
    * 100 TB posture: per iteration, ONE join shuffle (edges × ranks on
    * src — at real scale pre-partition both by src so the exchange is
    * reused across all iterations) and one map-side-combined groupBy on
    * dst; the rank table is two longs per node. Each rank_i feeds
    * rank_{i+1} exactly once, so the chain is safe to leave LAZY (no
    * recompute fan-out) — localCheckpoint fires only every
    * `checkpointInterval` passes, bounding both the lineage depth the
    * optimizer must chew and the number of materialization jobs (at
    * toy scale the per-job overhead, not the data, dominates an
    * every-pass checkpoint).
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 10,
      dampingPct: Int = 85,
      scale: Long = 1000000000000L,
      checkpointInterval: Int = 4,
      broadcastRanks: Boolean = true): DataFrame = {
    require(checkpointInterval >= 1, "checkpointInterval must be positive")
    require(iterations >= 1 && iterations <= 64, "iterations in [1, 64]")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0, 100]")
    require(scale >= 100L, "scale under 100 floors the damped base to 0")
    // materialized ONCE: every iteration re-scans the edge table, so
    // it must not stay a lazy view of the caller's (possibly join-
    // heavy) edge derivation
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val base = scale / 100 * (100 - dampingPct) +
      scale % 100 * (100 - dampingPct) / 100 // = (scale·(100−d)) div 100, overflow-free
    var rank = nodes.select(col("id"), lit(scale).as("rank"))
      .localCheckpoint(true)
    // the rank/deg tables are two longs per NODE — broadcast keeps the
    // edge table un-shuffled through both joins, leaving the (map-side
    // combined, node-sized) inflow aggregation as the only real
    // exchange per iteration. Right for node tables that fit in
    // executor memory — the normal entity-graph case; at web-graph node
    // counts pass broadcastRanks = false for the co-partitioned
    // shuffle-join path.
    def side(df: DataFrame): DataFrame =
      if (broadcastRanks) broadcast(df) else df
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(side(rank.withColumnRenamed("id", "src")), Seq("src"))
        .join(side(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "d")),
          Seq("src"))
        .select(col("dst").as("id"), expr("rank div d").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      rank = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"($dampingPct * coalesce(inflow, 0L)) div 100")).as("rank"))
      i += 1
      if (i % checkpointInterval == 0 && i < iterations)
        rank = rank.localCheckpoint(true)
    }
    rank
  }

  /** PERSONALIZED PageRank — random walk with restart to a SEED set:
    * the "importance relative to these entities" score behind
    * recommend-from-history and local community detection, versus
    * [[pageRank]]'s global prior. Identical integer-scaled iteration
    * except the teleport mass lands ONLY on seeds:
    *
    *   rank_{i+1}(v) = 1[v ∈ seeds]·(scale·(100−d) div 100)·n/|seeds|
    *                 + (d · Σ_{u→v} rank_i(u) div outdeg(u)) div 100
    *
    * (the seed base is grossed up by n/|seeds| so total restart mass
    * matches the global variant's — scores stay comparable across seed
    * set sizes). Same loud-overflow bound, same per-iteration one-join
    * one-aggregate shape, same unrollable-oracle property as
    * [[pageRank]]; non-seed nodes keep only inherited mass, so scores
    * decay with distance from the seeds — exactly the point.
    */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: Seq[Long],
      iterations: Int = 10,
      dampingPct: Int = 85,
      scale: Long = 1000000000000L,
      checkpointInterval: Int = 4,
      broadcastRanks: Boolean = true): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank: need at least one seed")
    require(checkpointInterval >= 1, "checkpointInterval must be positive")
    require(iterations >= 1 && iterations <= 64, "iterations in [1, 64]")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0, 100]")
    require(scale >= 100L, "scale under 100 floors the damped base to 0")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val isSeed = col("id").isin(seeds: _*)
    // grossed-up seed base: (n · scale·(100−d) div 100) div |seeds|,
    // computed against the lazily-derived node count (one-row fold, the
    // tfidf N rule — no eager driver count)
    val baseUnit = scale / 100 * (100 - dampingPct) +
      scale % 100 * (100 - dampingPct) / 100
    val nNodes = nodes.agg(count(lit(1)).as("__n"))
    def side(df: DataFrame): DataFrame =
      if (broadcastRanks) broadcast(df) else df
    var rank = nodes.crossJoin(broadcast(nNodes))
      .select(col("id"),
        when(isSeed, expr(s"(__n * ${baseUnit}L) div ${seeds.size}L"))
          .otherwise(0L).as("rank"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(side(rank.withColumnRenamed("id", "src")), Seq("src"))
        .join(side(deg.withColumnRenamed("id", "src")
          .withColumnRenamed("deg", "d")), Seq("src"))
        .select(col("dst").as("id"), expr("rank div d").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      rank = nodes.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(nNodes))
        .select(col("id"),
          (when(isSeed, expr(s"(__n * ${baseUnit}L) div ${seeds.size}L"))
            .otherwise(0L) +
            expr(s"($dampingPct * coalesce(inflow, 0L)) div 100"))
            .as("rank"))
      i += 1
      if (i % checkpointInterval == 0 && i < iterations)
        rank = rank.localCheckpoint(true)
    }
    rank
  }

  /** HITS (Kleinberg hubs & authorities) over a DIRECTED graph —
    * [[pageRank]]'s bipartite-flavored sibling: a node is a good HUB if
    * it points at good authorities, a good AUTHORITY if good hubs point
    * at it (customers who buy important parts / parts bought by
    * important customers). Fixed `iterations` of the power method with
    * L1 (sum) normalization in EXACT integers: each half-step is
    *   a'_j = Σ_{i→j} h_i,   a_j = (a'_j · scale) div Σ_j a'_j
    * (then the mirrored hub half-step) — L1 instead of the textbook L2
    * because a sum normalizer keeps every score an integer ratio the
    * oracle replays digit-for-digit, while an L2 norm would push a
    * sqrt into every iteration (rankings are identical; only the
    * constant scale differs). Scores are parts-per-`scale` of the
    * total mass, so they are partition-independent and engine-exact.
    *
    * Int64 bound: a raw inflow is < n·scale and the normalizing
    * multiply is < n·scale² — with the default scale 1e6 that is exact
    * for graphs to ~9M nodes; pass a smaller scale past that
    * (documented, the [[pageRank]] scale rule).
    *
    * 100 TB posture: per half-step, one edge-probe join against a
    * node-sized broadcast score table, one map-side-combined inflow
    * aggregation, and a ONE-ROW total folded back by broadcast — the
    * pageRank iteration shape exactly; localCheckpoint bounds lineage
    * every `checkpointInterval` rounds. Unlike pageRank (one table per
    * iteration), each HITS iteration chains TWO dependent half-steps,
    * so the lazy plan doubles per round and the per-stage task binary
    * with it — the default is every-round checkpointing (round-16 A/B:
    * interval 1 beat 2 at the q185 shape, ~1 MB task binaries shrank),
    * where pageRank's measured default stays 4.
    */
  def hits(
      edges: DataFrame,
      iterations: Int = 4,
      scale: Long = 1000000L,
      checkpointInterval: Int = 1,
      broadcastScores: Boolean = true): DataFrame = {
    require(iterations >= 1 && iterations <= 32, "iterations in [1, 32]")
    require(scale >= 100L, "scale under 100 floors every score to 0")
    require(checkpointInterval >= 1, "checkpointInterval must be positive")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    def side(df: DataFrame): DataFrame =
      if (broadcastScores) broadcast(df) else df
    // one normalized half-step: inflow of `scoreCol` over `joinKey`
    // (dst for the authority step, src for the hub step), then the L1
    // integer normalization against the one-row total
    def halfStep(score: DataFrame, scoreCol: String, joinKey: String,
        outKey: String, outCol: String): DataFrame = {
      val inflow = e
        .join(side(score.withColumnRenamed("id", joinKey)), Seq(joinKey))
        .groupBy(col(outKey).as("id"))
        .agg(sum(col(scoreCol)).as("__in"))
      val total = inflow.agg(sum(col("__in")).as("__t"))
      nodes.join(inflow, Seq("id"), "left")
        .crossJoin(broadcast(total))
        .select(col("id"),
          when(col("__t") > 0,
            expr(s"(coalesce(__in, 0L) * ${scale}L) div __t"))
            .otherwise(lit(0L)).as(outCol))
    }
    var hub = nodes.select(col("id"), lit(scale).as("hub"))
    var auth: DataFrame = null
    var i = 0
    while (i < iterations) {
      auth = halfStep(hub, "hub", "src", "dst", "auth")
      hub = halfStep(auth, "auth", "dst", "src", "hub")
      i += 1
      if (i % checkpointInterval == 0 && i < iterations) {
        auth = auth.localCheckpoint(true)
        hub = hub.localCheckpoint(true)
      }
    }
    hub.join(auth, Seq("id"))
  }

  /** Multi-source BFS: the shortest-path LEVEL (hop distance) from a
    * source set to every reachable node, capped at `maxDepth` — "how
    * far is every entity from the seed set", the reachability sibling
    * of [[pageRank]] (importance) and Dedup's connected components
    * (membership). Levels are small exact integers, so the DuckDB
    * oracle replays the whole search as a recursive CTE with
    * min-level aggregation.
    *
    * Frontier iteration: level d = (frontier d−1 ⋈ edges).dst, minus
    * everything already visited (the anti-join IS the min-level rule —
    * first discovery wins, and BFS discovers in level order). Per
    * level: one edge join + one distinct + one anti-join, all
    * node-grain except the edge probe; each frontier materializes
    * eagerly (localCheckpoint) so the lineage never re-runs prior
    * levels. Terminates EARLY on an empty frontier — the
    * `limit(1).count()` probe on a node-sized table (the Dedup.CC
    * convergence idiom), not a full count.
    *
    * 100 TB posture: the visited/frontier tables are node-sized (two
    * longs); the per-level join shuffles edges once on src — identical
    * to one pageRank iteration, and like it, AQE handles frontier
    * skew. Directed edges; pass both directions for undirected
    * reachability.
    */
  def bfsLevels(
      edges: DataFrame,
      sources: Seq[Long],
      maxDepth: Int,
      checkpointInterval: Int = 4): DataFrame = {
    require(sources.nonEmpty, "bfsLevels: need at least one source node")
    require(maxDepth >= 1 && maxDepth <= 64, "maxDepth in [1, 64]")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().localCheckpoint(true)
    var visited = sources.distinct.toDF("id")
      .select(col("id"), lit(0L).as("level")).localCheckpoint(true)
    var frontier = visited
    var d = 1
    var done = false
    while (d <= maxDepth && !done) {
      val next = frontier
        .join(e, col("id") === col("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(d.toLong).as("level"))
        .localCheckpoint(true)
      if (next.limit(1).isEmpty) done = true
      else {
        visited = visited.union(next)
        if (d % checkpointInterval == 0) visited = visited.localCheckpoint(true)
        frontier = next
        d += 1
      }
    }
    visited
  }

  /** Exact triangle count over an UNDIRECTED simple graph given as any
    * edge list (`src`/`dst`, either or both directions; self-loops
    * dropped, duplicates collapsed). Returns ONE row:
    * `(n_nodes, n_edges, n_wedges, n_triangles)` — wedges are the
    * candidate two-paths actually enumerated, so the row doubles as a
    * cost report for the pruning the orientation buys.
    *
    * Algorithm: degree orientation. Each canonical edge is directed
    * from its lower-(degree, id) endpoint to the higher one, and wedges
    * are enumerated only at their lowest-rank apex: work per node is
    * O(oriented-outdeg²), and the oriented out-degree is bounded by
    * O(√m) on ANY graph (a node of oriented out-degree d has d
    * neighbors of degree ≥ its own ≥ d, which needs d²/2 ≤ m edges) —
    * the hub that would contribute deg²/2 wedges apex-side contributes
    * nothing because all its edges point INTO it. That bound is what
    * makes exact counting feasible on a skewed 100 TB graph; the
    * closing check is one equi-join against the canonical edge table.
    *
    * Shuffle budget: degree aggregation + two node-grain broadcast-able
    * decorations, then the wedge self-join and the closing join, both
    * plain equi-joins on ids (AQE handles residual skew).
    */
  def triangles(edges: DataFrame): DataFrame = {
    val src = col("src").cast("long")
    val dst = col("dst").cast("long")
    // canonical: a < b, deduped across directions — reused three times
    val und = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") < col("b")).distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val ranked = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val lowFirst = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = ranked.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"))
    // each unordered neighbor pair once (id order among the two spokes)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.v").as("a"), col("e2.v").as("b"))
    // one pass over wedges: closing edge marked via left join
    val closed = wedges
      .join(und.withColumn("__g_hit", lit(1L)), Seq("a", "b"), "left")
      .agg(count(lit(1)).as("n_wedges"),
        coalesce(sum(col("__g_hit")), lit(0L)).as("n_triangles"))
    val sizes = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
    sizes.crossJoin(closed)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
  }

  /** LOCAL clustering coefficient — per node, how close its
    * neighborhood is to a clique: cc(v) = triangles(v) / wedges(v)
    * with wedges(v) = deg(v)·(deg(v)−1)/2, as floor-ppm integers
    * (exact: both counts are integers, one division). The node-level
    * sibling of [[triangles]]' global census — community tightness,
    * bot-ring detection, feature for node classification.
    *
    * Triangle enumeration reuses the [[triangles]] degree-orientation
    * (each triangle found exactly once at its lowest-degree corner's
    * wedge), then credits ALL THREE corners via one explode — so
    * per-node counts cost the same oriented wedge join as the global
    * count, O(Σ deg_oriented²) not O(Σ deg²), plus one node-grain
    * aggregation. Isolated-in-practice nodes (deg 1) report null cc.
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val src = col("src").cast("long")
    val dst = col("dst").cast("long")
    val und = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") < col("b")).distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val ranked = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val lowFirst = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = ranked.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("c"),
        least(col("e1.v"), col("e2.v")).as("a"),
        greatest(col("e1.v"), col("e2.v")).as("b"))
    val tri = wedges.join(und, Seq("a", "b"))
      .select(explode(array(col("c"), col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
    deg.join(tri, Seq("id"), "left")
      .na.fill(0L, Seq("n_tri"))
      .withColumn("n_wedges", expr("deg * (deg - 1L) div 2"))
      .withColumn("cc_ppm",
        when(col("n_wedges") > 0, expr("n_tri * 1000000L div n_wedges")))
  }

  /** Degree ASSORTATIVITY — the Pearson correlation of endpoint
    * degrees over all directed edge instances (each undirected edge
    * counted both ways, the standard Newman 2002 definition): positive
    * = hubs link hubs (social cores), negative = hubs link leaves
    * (star/bipartite-projection shapes). Exact decimal sums of integer
    * degrees (the q72 rule), one double close, floor-e6; degenerate
    * (regular graph — zero degree variance) yields null.
    *
    * One canonical-edge pass + one degree aggregation + one
    * broadcast-degree join + one map-side-combined moment aggregation.
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val src = col("src").cast("long")
    val dst = col("dst").cast("long")
    val und = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") < col("b")).distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val both = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
    val xy = both
      .join(deg.select(col("id").as("u"), col("deg").as("x")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("y")), Seq("v"))
      .select(col("x").cast("decimal(38,0)").as("x"),
        col("y").cast("decimal(38,0)").as("y"))
    val m = xy.agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
      sum(col("x")).as("__sx"), sum(col("x") * col("x")).as("__sxx"),
      sum(col("x") * col("y")).as("__sxy"),
      min(col("x")).as("__mn"), max(col("x")).as("__mx"))
    // by symmetry sy = sx and syy = sxx — the mirrored union makes the
    // marginals identical, so one pair of sums serves both axes
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val sxx = col("__sxx").cast("double")
    val sxy = col("__sxy").cast("double")
    val varx = n * sxx - sx * sx
    m.select(expr("CAST(__n AS BIGINT) div 2L").as("n_edges"),
      when(col("__mn") =!= col("__mx") && varx > 0.0,
        floor((n * sxy - sx * sx) / varx * 1e6).cast("long"))
        .as("assort_e6"))
  }

  /** Two-hop neighbor counts — one step of sparse A²: for node pairs
    * (a, c) with NO direct edge, how many common neighbors connect
    * them ("customers who bought this also bought", link prediction's
    * common-neighbors score). The wedge join is the [[triangles]]
    * machinery pointed at the OPEN wedges instead of the closed ones.
    *
    * Fan-out control is a hard precondition, not a heuristic: wedge
    * count is Σ deg², so hub nodes are EXCLUDED as middles via
    * `maxMiddleDegree` (reported in the companion count so the cap is
    * visible, never silent — the no-silent-caps rule). Both hops stay
    * equi-joins; the anti-join removes directly-connected pairs.
    */
  def twoHopPairs(
      edges: DataFrame,
      maxMiddleDegree: Long = 64L): DataFrame = {
    val src = col("src").cast("long")
    val dst = col("dst").cast("long")
    val und = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") < col("b")).distinct()
      .localCheckpoint(true)
    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .union(und.select(col("b").as("id"), col("a").as("nb")))
    val deg = adj.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val mids = deg.where(col("deg") <= maxMiddleDegree)
      .select(col("id").as("__mid"))
    val byMid = adj.join(mids, col("nb") === col("__mid"), "left_semi")
    val wedges = byMid.as("e1")
      .join(byMid.as("e2"),
        col("e1.nb") === col("e2.nb") && col("e1.id") < col("e2.id"))
      .select(col("e1.id").as("a"), col("e2.id").as("b"))
    wedges
      .join(und, Seq("a", "b"), "left_anti")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
  }

  /** k-CORE decomposition membership by BOUNDED iterative peeling: the
    * k-core is the maximal subgraph where every vertex keeps degree
    * ≥ k — the standard "dense part of the graph" extraction
    * (community cores, spam/bot rings, collaboration hubs). Each round
    * recomputes degrees over the surviving subgraph and drops
    * below-k vertices; the TRUE k-core is the fixpoint.
    *
    * Round budget as CONTRACT, not convenience: peeling can need O(n)
    * rounds in the worst case (a chain peels from the ends inward), so
    * an engine-replayable version fixes `rounds` and both the operator
    * and any replay run EXACTLY that schedule — the operator early-exits
    * when a round removes nothing (the fixpoint; every later round is
    * a no-op, so early exit ≡ running all rounds). If the budget was
    * too small for the data's peel depth, the result is the honest
    * "rounds-bounded core" — callers needing the certified fixpoint
    * check [[kCoreConverged]] semantics by comparing two budgets.
    *
    * 100 TB posture: per round ONE map-side-combined degree count and
    * two semi-join filters of the edge list (broadcast-sized survivor
    * list after the first peels; AQE picks the build side from runtime
    * sizes); the edge table shrinks monotonically and is
    * localCheckpoint'd each round to cut the loop's lineage.
    *
    * @param edges undirected edge list (src, dst); duplicates and
    *              direction collapse, self-loops dropped
    * @return (id, core_deg) for vertices surviving `rounds` peels,
    *         core_deg = degree within the surviving subgraph
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 12): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    val src = col("src").cast("long")
    val dst = col("dst").cast("long")
    val und0 = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") < col("b")).distinct()
    // both directions: degree = COUNT per src over the mirrored table.
    // Hash-partitioned by src ONCE, up front (round-16 optimization,
    // guide §2.3 "shuffle fewer bytes"): with every src confined to one
    // partition, each round's degree groupBy emits exactly ONE partial
    // row per node into its exchange (node-grain) instead of up-to-one
    // per (partition, node) (≈ parallelism × node-grain) — the peel's
    // per-round shuffle drops from edge-combine-residue to node count.
    // (localCheckpoint under AQE does not preserve the partitioning
    // metadata, so the exchange NODE stays in each round's plan — the
    // bytes through it are what shrink.) The survivor semi-join side is
    // node-sized and AQE broadcasts it when it measures small, leaving
    // the edge table itself un-shuffled by the joins. The explicit
    // partition count is the session's own shuffle-partition setting —
    // the cluster-tuned knob, not a local constant.
    val nPart = edges.sparkSession.sessionState.conf.numShufflePartitions
    var e = und0.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und0.select(col("b").as("src"), col("a").as("dst")))
      .repartition(nPart, col("src"))
      .localCheckpoint(true)
    var done = false
    var round = 0
    // one count per round: the checkpoint must materialize anyway, and
    // comparing against the REMEMBERED previous count halves the job
    // count of the loop
    var prevEdges = e.count()
    while (round < rounds && !done) {
      val survivors = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("__deg"))
        .where(col("__deg") >= k)
        .select(col("id"))
      val pruned = e
        .join(survivors.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(survivors.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      val n = pruned.count()
      if (n == prevEdges) done = true
      prevEdges = n
      e = pruned
      round += 1
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg"))
  }

  /** DETERMINISTIC random walks — the DeepWalk/node2vec corpus
    * generator without the RNG: `walksPerNode` fixed-length walks from
    * every node whose step-i choice indexes the current node's sorted
    * neighbor list at `hash60(start#replica#i) mod degree` (the
    * portable md5 recipe every sampler here uses). The walk corpus
    * feeds sequence models exactly like text does (walks are the
    * "sentences" graph-embedding training consumes) — and because
    * the draws are content-addressed, any engine reproduces every
    * walk node-for-node, and a re-run after a graph append changes
    * only walks the new edges actually touch.
    *
    * Walks stop early at sinks (no outgoing edge). Choices are
    * independent of the current node's identity (pure function of
    * walk id + step) — a valid uniform step draw, chosen over
    * hash(current) so two replicas at the same node still diverge.
    *
    * 100 TB shape: the neighbor index is one per-src window over the
    * edge list (grouped sort, spills fine); each step is two
    * equi-joins of the walks-sized frontier against degree/index
    * tables — `steps` is a bounded constant, so the whole corpus is
    * O(nodes × walksPerNode × steps) rows, checkpointed per step to
    * keep lineage flat.
    *
    * @return exploded corpus: (start, w, step, node), step 0 = start
    */
  def deterministicWalks(
      edges: DataFrame,
      walksPerNode: Int,
      steps: Int,
      salt: String = "walk"): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 128 &&
      steps >= 1 && steps <= 64, "bounded walk corpus only")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    // deg and the sorted-neighbor index are consumed by EVERY step's
    // joins; left lazy they are recomputed per step — 16 steps re-ran
    // the edge-grain row_number window 16× (round-16 profile: q157's
    // task time was ~95 s, ~3× the materialized cost). Edge-grain like
    // `e` itself (already checkpointed), so the one-time
    // materialization is the same storage class the operator already
    // pays.
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(true)
    val idx = e.withColumn("__nidx",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("dst"))).cast("long") - 1)
      .localCheckpoint(true)
    var cur = e.select(col("src").as("start")).distinct()
      .withColumn("w", explode(array((0 until walksPerNode).map(lit): _*)))
      .select(col("start"), col("w").cast("long").as("w"),
        lit(0L).as("step"), col("start").as("node"))
      .localCheckpoint(true)
    val parts = scala.collection.mutable.Buffer(cur)
    for (i <- 1 to steps) {
      val pick = graft.functions.PortableHash.hash60(
        concat(col("start").cast("string"), lit("#"),
          col("w").cast("string"), lit("#"), lit(i.toString)), salt) %
        col("__deg")
      cur = cur
        .join(deg, col("node") === deg("src"))
        .withColumn("__pick", pick)
        .drop("src")
        .join(idx, col("node") === idx("src") && col("__pick") === col("__nidx"))
        .select(col("start"), col("w"), lit(i.toLong).as("step"),
          col("dst").as("node"))
        .localCheckpoint(true)
      parts += cur
    }
    parts.reduce(_ unionByName _)
  }

  /** Bounded Bellman–Ford: multi-source weighted shortest-path
    * distances after EXACTLY `rounds` relaxation rounds — the round
    * budget is part of the CONTRACT (the [[kCore]] stance), so the
    * oracle replays the identical schedule and the answer is exact for
    * every node whose shortest path uses ≤ `rounds` edges (a graph of
    * diameter d converges at rounds ≥ d; unreached nodes are absent).
    * Negative weights are REJECTED — with non-negative weights every
    * relaxation round only improves distances, so a converged table is
    * the true SSSP answer, no negative-cycle caveat.
    *
    * Per round: one dist⋈edges equi-join + one map-side-combined
    * min-groupBy; the dist table is node-grain (never edge-grain
    * between rounds), localCheckpointed per round to cut the iterative
    * lineage ([[Dedup.connectedComponents]]'s reasoning).
    *
    * @param edges  (src, dst, w) directed, w ≥ 0 integer
    * @return (node, dist) — min total weight from ANY source
    */
  def shortestPathsK(
      edges: DataFrame,
      sources: Seq[Long],
      rounds: Int): DataFrame = {
    require(sources.nonEmpty, "shortestPathsK: need at least one source")
    require(rounds >= 1 && rounds <= 64, "rounds in [1, 64]")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"),
        when(col("w") >= 0L, col("w").cast("long"))
          .otherwise(raise_error(lit(
            "Graph.shortestPathsK: negative edge weight")).cast("long"))
          .as("w"))
      .localCheckpoint(true)
    var dist = sources.distinct.toDF("node")
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** Longest-path-from-source LEVELS of a DAG — the topological depth
    * readout (crawl depth over a condensation, build-stage waves over a
    * dependency graph): level(v) = 0 for sources, else 1 + max over
    * predecessors. Fixed-round max-label propagation under the
    * [[stronglyConnectedComponents]] budget contract: each round folds
    * `level(u) + 1` along edges; on a DAG the fixpoint is the longest
    * path and arrives within `depth` rounds; if the budget round still
    * changes labels the input either is DEEPER than the budget or has a
    * CYCLE (where "levels" are undefined — levels would grow forever),
    * and the operator RAISES naming both possibilities rather than
    * returning silently-wrong depths. One equi-join + one
    * map-side-combined max per round over node-sized state.
    *
    * @param edges directed DAG (src, dst); duplicates collapse
    * @return (id, level)
    */
  def dagLevels(edges: DataFrame, maxRounds: Int = 32): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 256, "bounded budget only")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct().localCheckpoint(true)
    var lab = e.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct().select(col("id"), lit(0L).as("lv"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val push = e.join(lab.select(col("id").as("src"), col("lv")),
          Seq("src"))
        .groupBy(col("dst").as("id")).agg(max(col("lv") + 1).as("__in"))
      val next = lab.join(push, Seq("id"), "left")
        .select(col("id"), greatest(col("lv"), col("__in")).as("lv"))
        .localCheckpoint(true)
      val changed = next.select(col("id"), col("lv").as("__new"))
        .join(lab, Seq("id"))
        .where(col("__new") > col("lv")).count()
      lab = next
      converged = changed == 0L
      round += 1
    }
    if (!converged) sys.error(
      s"Graph.dagLevels: levels still changing after maxRounds=" +
        s"$maxRounds — the graph is deeper than the budget or contains " +
        s"a cycle (levels are undefined on cycles; run " +
        s"stronglyConnectedComponents first and condense)")
    lab.select(col("id"), col("lv").as("level"))
  }

  /** STRONGLY connected components of a DIRECTED graph — the directed
    * sibling of [[Dedup.connectedComponents]] (crawl-graph cycle
    * analysis, dependency-cycle detection, link-farm rings — where
    * undirected CC over-merges: a link TO a page is not a link back).
    *
    * Algorithm: iterative min-label FORWARD-BACKWARD with pointer
    * jumping. Per phase, over the still-unassigned subgraph:
    * `f(v)` = min node id that REACHES v and `b(v)` = min node id v
    * reaches, each computed by min-label propagation where a round
    * folds in (a) labels along edges and (b) the label OF the label —
    * valid because a forward label is itself an ancestor (w →* u →* v
    * composes), and the jump collapses label chains at the
    * [[Dedup.connectedComponents]] pointer-jumping rate, O(log path)
    * rounds instead of O(path). If `f(v) = b(v) = m` then m →* v and
    * v →* m, so v ∈ SCC(m) — and the converse holds once propagation
    * converges, because every witness path of an SCC lies WHOLLY
    * inside it (each node on a v →* m →* v cycle is mutually
    * reachable with both), so min-over-ancestors is exact within the
    * component. Assigned components are removed; a node stranded with
    * no remaining edges is its own singleton SCC (paths between
    * same-SCC nodes never leave the SCC, so removing OTHER components
    * cannot break one). The global-min active node always satisfies
    * f = b = itself, so every phase retires ≥ 1 component.
    *
    * Budget as CONTRACT (the [[kCore]] stance, but RAISING): each
    * propagation runs ≤ `maxRounds` rounds with early exit at the
    * fixpoint (no label changed — every later round is a no-op, so a
    * replay running all `maxRounds` rounds computes the identical
    * labels), and the phase loop runs ≤ `maxPhases`. A budget too
    * small for the data RAISES loudly rather than returning a
    * silently-partial grouping — an under-propagated f would split
    * components, which no caller can detect downstream.
    *
    * 100 TB posture: per round ONE equi-join of edges against the
    * node-sized label table + ONE self-join of the label table + one
    * map-side-combined min — node-sized state, localCheckpoint'd
    * lineage cuts, the same shape as [[pageRank]] rounds; the edge set
    * shrinks monotonically across phases.
    *
    * @param edges directed (src, dst); duplicates collapse, self-loops
    *              allowed (they make a node trivially cyclic)
    * @return (id, scc) — scc = min node id of the component
    */
  def stronglyConnectedComponents(
      edges: DataFrame,
      maxRounds: Int = 32,
      maxPhases: Int = 4): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 64 &&
      maxPhases >= 1 && maxPhases <= 16, "bounded budgets only")
    val parent = edges.sparkSession
    // Spark 4.1's Union constraint rewrite (UnionBase.rewriteConstraints)
    // throws "key not found" on the assigned-components union when a
    // child carries an id=scc alias constraint — a planner bug this
    // loop reliably trips via localCheckpoint's stats/constraints
    // rewrite. Constraint propagation buys nothing here (every frame in
    // the loop is checkpointed state), so scope it OFF — on a CHILD
    // session (`newSession`: same SparkContext, isolated SQLConf), so
    // a concurrent query on the caller's session never observes the
    // toggle (GraphSpec pins this). The edge plan crosses sessions via
    // a global temp view (eagerly analyzed, then dropped); the result
    // crosses back the same way — it is checkpoint-backed (LogicalRDD),
    // so the caller's downstream plans never contain loop internals.
    // Note: newSession starts from SparkConf-level SQL confs; caller
    // RUNTIME conf edits don't apply inside the loop (none matter — the
    // loop pins its own behavior via checkpoints and explicit shapes).
    val iso = parent.newSession()
    iso.conf.set("spark.sql.constraintPropagation.enabled", "false")
    val view = "graft_scc_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    edges.createOrReplaceGlobalTempView(view)
    val out =
      try sccLoop(iso.table(s"global_temp.$view"), maxRounds, maxPhases)
      finally parent.catalog.dropGlobalTempView(view)
    out.createOrReplaceGlobalTempView(view + "_out")
    try parent.table(s"global_temp.${view}_out")
    finally parent.catalog.dropGlobalTempView(view + "_out")
  }

  /** Checkpoint with a STATS RESET — the iterative-self-join fix.
    * `localCheckpoint` truncates lineage but PRESERVES the truncated
    * plan's estimated statistics; in a loop whose round contains a
    * label SELF-join (the pointer-jumping shortcut), the size estimate
    * therefore SQUARES every round — the estimate's digit count
    * doubles per round, and past ~20 rounds Catalyst spends its time
    * multiplying million-digit BigIntegers on the driver (observed:
    * the 2M-edge scale probe pinned one core in
    * BigInteger.multiplyToomCook3 for half an hour). Re-rooting the
    * materialized RDD through `createDataFrame` makes the leaf's
    * stats the flat default again — O(1) estimation forever, at the
    * cost of one Row re-encode when consumed (node-grain tables only).
    * Loops whose rounds only join against a FIXED table (CC, PageRank,
    * BFS) grow the estimate one factor per round — digits linear in
    * rounds — and don't need this.
    */
  private[operators] def cpFlatStats(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    c.sparkSession.createDataFrame(c.rdd, c.schema)
  }

  private def sccLoop(
      edges: DataFrame, maxRounds: Int, maxPhases: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    {
    var rem = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    var remEdges = rem.count()
    var assigned = Seq.empty[(Long, Long)].toDF("id", "scc")

    // min-label propagation with pointer jumping over the CURRENT
    // subgraph; forward = labels flow src→dst (ancestor mins), else
    // dst→src (descendant mins). Raises if maxRounds is too small.
    //
    // Propagation order is a DETERMINISTIC HASH of the node id (ties
    // impossible: the id itself is the struct's second field), not the
    // id order. Chain-jump acceleration only helps once label CHAINS
    // form, and chains only form where propagation makes interim
    // progress; under the raw id order an adversarial layout — e.g.
    // ascending ids around a directed cycle, propagated backward —
    // keeps every label self-pointing (all interim descendant minima
    // ARE the node itself), so the true min crosses ONE edge per round:
    // O(diameter) rounds, measured as exactly changed=1 per round on
    // the round-8 scale probe's planted 4096-cycle. Hashing the order
    // makes every layout statistically random: O(log n) rounds and
    // O(log n) phases with high probability for ANY input ids. The
    // f==b SCC characterization is order-agnostic (within an SCC every
    // node shares Anc and Desc, so f and b are component-constants and
    // f==b ⟺ the order-min of Anc∪Desc lies in the component), and the
    // REPORTED label is recovered as the min REAL id per component
    // below — the output contract is unchanged, which is what keeps
    // the q233/q236/q239 oracle replays (real-id min to ITS fixpoint)
    // valid without modeling the engine's acceleration.
    //
    // Acceleration is ARRIVAL-PARENT POINTER HALVING, not label-value
    // jumping. The naive jump ("adopt the label of my current label's
    // NODE") has a measured dead end: the interim-min node can sit on
    // a SIDE BRANCH (e.g. a tail hanging off a cycle) whose own label
    // is already its local fixpoint — jumping there yields nothing,
    // and the frontier serializes back to one edge-hop per round
    // (observed on the round-8 probe: changed=2 per round for
    // thousands of rounds on a 4096-cycle with a 25-node tail). The
    // parent pointer instead tracks the node that SUPPLIED the current
    // label via an edge — always on the propagation path — and halves
    // every round (ptr ← ptr(ptr)); adopting lab(ptr) pulls minima the
    // frontier has not carried here yet, so compressed segments
    // broadcast a newly arrived min in O(tree depth). Soundness: for
    // forward propagation ptr(v) ∈ Anc(v) ∪ {v} inductively (parents
    // are in-neighbors, halving stays inside the ancestor set), and
    // lab(ptr(v)) is a min over Anc(ptr(v)) ⊆ Anc(v) — every adopted
    // value is a true ancestor min, so the fixpoint is exact.
    //
    // Honest worst case: unlike undirected CC, DIRECTED label
    // fixpoints differ per node (Anc/Desc sets differ), so a pointer
    // tree can legitimately lead into a side branch whose labels are
    // already at a DIFFERENT fixpoint — a dead hub that never learns
    // the component's min, leaving its subscribers to edge-speed
    // propagation (measured: a cycle with a small-hash tail serializes
    // its backward pass to one hop per round past the tail's entry).
    // Typical graphs converge in ≈ 3·log₂ d rounds via parallel
    // segment merging (512-cycle: 28; 4096-cycle: 35); adversarial
    // branch structure degrades toward O(d) and hits the RAISING
    // budget rather than a silent split. Breaking that bound needs
    // transitive-closure edge doubling, whose edge growth is not
    // viable at data scale — the budget contract is the design choice.
    // FUSED bidirectional propagation (round-9): both directions'
    // labels ride ONE node-grain table (labF/ptrF/labB/ptrB), so a
    // round costs one checkpoint materialization + one convergence
    // count instead of two — halving the sub-second driver-coordinated
    // job count that the round-8 probe measured as the 2M-edge wall's
    // actual cost driver (round latency, not shuffle volume). The
    // per-direction update rules are byte-identical to the sequential
    // form (a direction never reads the other's state inside a round),
    // so labels, round counts per direction, and the f==b fixpoint are
    // unchanged; a direction that converges first is FROZEN — its
    // edge/jump joins drop out of later rounds' plans — so the fused
    // round count is max(f, b), not f + b.
    def propagate(nodes: DataFrame): DataFrame = {
      val ord = struct(
        xxhash64(col("id"), lit("graft_scc_order")).as("h"),
        col("id").as("i"))
      var lab = cpFlatStats(nodes.select(col("id"),
        ord.as("labF"), col("id").as("ptrF"),
        ord.as("labB"), col("id").as("ptrB")))
      var round = 0
      var doneF = false
      var doneB = false
      while (round < maxRounds && !(doneF && doneB)) {
        // no unions: Spark's Union constraint rewrite chokes on
        // shared-lineage children; equivalent min via left joins
        // (least() skips nulls, so absent contributions are identity)
        def edgeMin(from: String, to: String, labCol: String, sfx: String) =
          rem.select(col(from).as("__at"), col(to).as("id"))
            .join(lab.select(col("id").as("__at"),
              struct(col(labCol).as("l"), col("id").as("u")).as(s"__em$sfx")),
              Seq("__at"))
            .groupBy(col("id")).agg(min(col(s"__em$sfx")).as(s"__em$sfx"))
        def jump(labCol: String, ptrCol: String, sfx: String) =
          lab.select(col("id"), col(ptrCol).as("__pt"))
            .join(lab.select(col("id").as("__pt"), col(labCol).as(s"__jl$sfx"),
              col(ptrCol).as(s"__jp$sfx")), Seq("__pt"))
            .select(col("id"), col(s"__jl$sfx"), col(s"__jp$sfx"))
        // per-direction output columns; a frozen direction passes
        // through untouched (its fixpoint makes every later update a
        // no-op anyway — freezing just saves the joins)
        def dirCols(labCol: String, ptrCol: String, sfx: String) = Seq(
          least(col(labCol), col(s"__em$sfx.l"), col(s"__jl$sfx")).as(labCol),
          // parent update: a strictly better edge supply re-roots the
          // chain at the supplying neighbor; otherwise halve
          when(col(s"__em$sfx").isNotNull &&
            col(s"__em$sfx.l") < least(col(labCol),
              coalesce(col(s"__jl$sfx"), col(labCol))),
            col(s"__em$sfx.u"))
            .otherwise(coalesce(col(s"__jp$sfx"), col(ptrCol))).as(ptrCol))
        var cur = lab
        if (!doneF) cur = cur
          .join(edgeMin("src", "dst", "labF", "f"), Seq("id"), "left")
          .join(jump("labF", "ptrF", "f"), Seq("id"), "left")
        if (!doneB) cur = cur
          .join(edgeMin("dst", "src", "labB", "b"), Seq("id"), "left")
          .join(jump("labB", "ptrB", "b"), Seq("id"), "left")
        val fCols = if (doneF) Seq(col("labF"), col("ptrF"))
          else dirCols("labF", "ptrF", "f")
        val bCols = if (doneB) Seq(col("labB"), col("ptrB"))
          else dirCols("labB", "ptrB", "b")
        // cpFlatStats, not plain localCheckpoint: jump self-joins lab,
        // so a stats-preserving checkpoint would square the size
        // estimate every round (see cpFlatStats)
        val next = cpFlatStats(cur.select((col("id") +: (fCols ++ bCols)): _*))
        // ONE aggregation yields both directions' changed counts
        val ch = next
          .select(col("id"), col("labF").as("__nf"), col("labB").as("__nb"))
          .join(lab.select(col("id"), col("labF").as("__of"),
            col("labB").as("__ob")), Seq("id"))
          .agg(sum(when(col("__nf") < col("__of"), 1L).otherwise(0L)),
            sum(when(col("__nb") < col("__ob"), 1L).otherwise(0L)))
          .head()
        val (chF, chB) = (ch.getLong(0), ch.getLong(1))
        if (sys.env.contains("GRAFT_SCC_DEBUG"))
          System.err.println(
            s"[scc-debug] round=$round changedF=$chF changedB=$chB")
        lab = next
        doneF = doneF || chF == 0L
        doneB = doneB || chB == 0L
        round += 1
      }
      if (!(doneF && doneB)) sys.error(
        s"Graph.stronglyConnectedComponents: min-label propagation " +
          s"did not converge within maxRounds=$maxRounds — an " +
          s"under-propagated label would silently SPLIT components; " +
          s"raise the budget past the subgraph's label-chain depth")
      lab
    }

    var phase = 0
    while (phase < maxPhases && remEdges > 0) {
      val nodes = rem
        .select(explode(array(col("src"), col("dst"))).as("id"))
        .distinct().localCheckpoint(true)
      val fb = propagate(nodes)
      // members of an assigned component satisfy labF == labB (the
      // hash-order pivot; lab.i = the pivot's real id) — with both
      // directions on one row this is a narrow FILTER, the cross-
      // direction join of the sequential form gone. The REPORTED
      // component label is the min REAL id over the members — the
      // pre-hash-order output contract, recovered with one
      // component-grain aggregation
      val pivoted = fb.where(col("labF") === col("labB"))
        .select(col("id"), col("labF.i").as("__pivot"))
        .localCheckpoint(true)
      val scc = pivoted
        .join(pivoted.groupBy(col("__pivot"))
          .agg(min(col("id")).as("scc")), Seq("__pivot"))
        .select(col("id"), col("scc"))
        .localCheckpoint(true)
      val nextRem = rem
        .join(scc.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(scc.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      // nodes whose every edge touched a retired component: singleton
      // SCCs (same-component witness paths never leave the component)
      val orphans = nodes
        .join(scc.select(col("id")), Seq("id"), "left_anti")
        .join(nextRem.select(explode(array(col("src"), col("dst")))
          .as("id")).distinct(), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("scc"))
        .localCheckpoint(true)
      assigned = assigned.unionByName(scc).unionByName(orphans)
        .localCheckpoint(true)
      remEdges = nextRem.count()
      rem = nextRem
      phase += 1
    }
    if (remEdges > 0) sys.error(
      s"Graph.stronglyConnectedComponents: $remEdges edges still " +
        s"unassigned after maxPhases=$maxPhases — the phase budget " +
        s"must cover the component-removal depth; raise it")
    assigned
    }
  }
}
