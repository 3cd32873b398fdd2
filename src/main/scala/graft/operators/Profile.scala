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

  /** Snapshot drift screen: [[summarize]] both releases of a table and
    * report, per column, the null-rate movement (floor-ppm), the
    * distinct-cardinality movement (floor-ppm ratio new/old), and
    * whether the lexicographic min/max moved — the cheap "did this
    * batch change shape" gate a pipeline runs before promoting a
    * snapshot (the value-level sibling of ChangeCapture.snapshotDiff,
    * which answers WHICH rows changed; this answers whether the
    * DISTRIBUTION changed, at profile cost, no key needed).
    *
    * An empty snapshot on either side (zero rows → zero profile rows)
    * survives the FULL OUTER join with zeroed stats and
    * `side_missing=true` rather than silently vanishing; `cols` must
    * exist in both schemas (a rename IS schema drift — catch it from
    * the schema, not the profile). One scan per snapshot (the melt),
    * then a |cols|-row join — report-grain.
    * All-integer output (counts, floor-ppm, boolean flags); same
    * string-profile caveat as [[summarize]]: keep float columns out
    * (engine float-formatting differs; profile them via typed stats).
    */
  def drift(before: DataFrame, after: DataFrame, cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, s: String) =
      summarize(df, cols).select(col("col_name"),
        col("n_rows").as(s"n_rows_$s"), col("n_nulls").as(s"n_nulls_$s"),
        col("n_distinct").as(s"n_distinct_$s"),
        col("min_s").as(s"min_$s"), col("max_s").as(s"max_$s"))
    def ppm(num: String, den: String) =
      when(col(den) > 0, expr(s"$num * 1000000L div $den")).otherwise(lit(0L))
    side(before, "a").join(side(after, "b"), Seq("col_name"), "full_outer")
      .select(col("col_name"),
        coalesce(col("n_rows_a"), lit(0L)).as("n_rows_a"),
        coalesce(col("n_rows_b"), lit(0L)).as("n_rows_b"),
        ppm("n_nulls_a", "n_rows_a").as("null_ppm_a"),
        ppm("n_nulls_b", "n_rows_b").as("null_ppm_b"),
        (ppm("n_nulls_b", "n_rows_b") - ppm("n_nulls_a", "n_rows_a"))
          .as("null_delta_ppm"),
        coalesce(col("n_distinct_a"), lit(0L)).as("n_distinct_a"),
        coalesce(col("n_distinct_b"), lit(0L)).as("n_distinct_b"),
        when(col("n_distinct_a") > 0,
          expr("n_distinct_b * 1000000L div n_distinct_a")).as("distinct_ratio_ppm"),
        (col("n_rows_a").isNull || col("n_rows_b").isNull).as("side_missing"),
        not(col("min_a") <=> col("min_b")).as("min_changed"),
        not(col("max_a") <=> col("max_b")).as("max_changed"))
  }

  /** Categorical ASSOCIATION screen between two columns — mutual
    * information, the chi-square statistic, and Cramér's V from ONE
    * contingency pass: the feature-selection question ("does knowing A
    * tell you anything about B") the correlation matrix can't answer
    * for categoricals. Null in either column drops the row (missing is
    * not a category — impute first if it is).
    *
    * Exactness: the contingency table and marginals are integer
    * counts; each cell term is one fixed double parenthesization from
    * those integers (ln per observed cell — the q36/q113 parity
    * precedent), floor-e6 truncated BEFORE summation so the reduce is
    * integer addition (order-independent). Chi-square sums over the
    * FULL marginal grid (a zero observed cell still contributes its
    * expectation); MI sums observed cells only (0·ln 0 = 0).
    *
    * 100 TB shape: one map-side-combined groupBy(a, b) — the only
    * data-sized pass; marginals, the vocab_a × vocab_b grid, and the
    * final fold are contingency-grain (bounded by the vocab product;
    * this is a REPORT op for categorical vocabs, not id columns —
    * dictionary-encode or bucket first if |A|·|B| is data-sized).
    *
    * @return one row: (n, card_a, card_b, mi_e6, chi2_e6, dof,
    *         cramers_v_e6); degenerate inputs (single category either
    *         side, or empty) yield zeros with dof 0 and null V
    */
  /** Per-column Shannon entropy report — the information-content
    * profile of categorical columns (a constant column carries 0 bits;
    * an id column carries ln(n)): `H = ln(n) − (Σ c·ln c)/n` over the
    * value counts. Float-sum discipline: each `c·ln c` term is
    * floor-e6-quantized to a LONG before the sum (the q158 DCG rule —
    * a raw double Σ would be reduction-order-dependent), so
    * `h_e6 = (floor(1e6·n·ln n) − Σ floor(1e6·c·ln c)) div n` is an
    * exact integer pipeline after the per-term ln.
    *
    * One melt + one (column, value) count + one column-grain close;
    * null is counted as its own value (a 90%-null column is nearly
    * constant — that IS the signal).
    */
  def entropyReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val melted = df.unpivot(
      Array.empty,
      cols.map(c => col(c).cast("string").as(c)).toArray,
      "column", "value")
    val counts = melted.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("column"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * lit(1000000.0)).cast("long")).as("__st"))
      .withColumn("entropy_e6", expr(
        "(CAST(FLOOR(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) " +
          "* 1000000.0) AS BIGINT) - __st) div n"))
      .drop("__st")
  }

  def association(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .where(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("a"), col(colB).cast("string").as("b"))
      .agg(count(lit(1)).as("nab"))
    val ma = cells.groupBy(col("a")).agg(sum(col("nab")).as("na"))
    val mb = cells.groupBy(col("b")).agg(sum(col("nab")).as("nb"))
    val tot = cells.agg(sum(col("nab")).as("n"),
      count(lit(1)).as("__cells"))
    val grid = ma.crossJoin(mb)
      .join(cells, Seq("a", "b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("na"), col("nb"), col("n"),
        coalesce(col("nab"), lit(0L)).as("nab"))
    val e = col("na").cast("double") * col("nb") / col("n")
    val miTerm = when(col("nab") > 0,
      floor((col("nab").cast("double") / col("n")) *
        log(col("nab").cast("double") * col("n") /
          (col("na").cast("double") * col("nb"))) * lit(1000000.0))
        .cast("long")).otherwise(lit(0L))
    val chiTerm = floor((col("nab") - e) * (col("nab") - e) / e * lit(1000000.0))
      .cast("long")
    val cards = ma.agg(count(lit(1)).as("card_a"))
      .crossJoin(mb.agg(count(lit(1)).as("card_b")))
    val sums = grid
      .agg(max(col("n")).as("n"), sum(miTerm).as("mi_e6"),
        sum(chiTerm).as("chi2_e6"))
    sums.crossJoin(broadcast(cards))
      .select(
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("card_a"), lit(0L)).as("card_a"),
        coalesce(col("card_b"), lit(0L)).as("card_b"),
        coalesce(col("mi_e6"), lit(0L)).as("mi_e6"),
        coalesce(col("chi2_e6"), lit(0L)).as("chi2_e6"),
        (greatest(coalesce(col("card_a"), lit(0L)) - 1, lit(0L)) *
          greatest(coalesce(col("card_b"), lit(0L)) - 1, lit(0L))).as("dof"))
      .withColumn("cramers_v_e6",
        when(col("dof") > 0 && col("n") > 0,
          floor(sqrt((col("chi2_e6").cast("double") / 1000000.0) /
            (col("n") * least(col("card_a") - 1, col("card_b") - 1)))
            * lit(1000000.0)).cast("long")))
  }

  /** CONCENTRATION report over a key-grain integer measure: the Gini
    * coefficient plus head-share metrics — "how unequal is revenue /
    * token mass / traffic across this dimension", the inequality
    * summary behind every pareto chart. All-integer floor-ppm:
    * G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) ·1e6 div (n·Σx) with x sorted ASC
    * (ties broken by key — same total either way), top-share = head
    * sums over the DESC order. Zero/negative totals and single-key
    * dimensions yield null Gini (undefined), not garbage.
    *
    * Overflow bound (documented, ANSI-raising): the numerator needs
    * 2·n·Σx·1e6 < 2^63 — keep the measure in coarse units (dollars,
    * kilotokens) so n·Σx < 4.6e12; rescaling does not change G.
    *
    * 100 TB shape: ONE map-side-combined key aggregation, then the
    * ranking windows run at KEY grain (an aggregate beneath an
    * unpartitioned window — the PlanSpec boundedness rule; a
    * dimension you'd pareto-chart is report-sized) and fold to a
    * single row.
    */
  def concentration(df: DataFrame, keyCol: String, valueCol: String,
      topPct: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topPct >= 1 && topPct <= 99, "topPct in [1, 99]")
    val keyAgg = df.groupBy(col(keyCol).as("k"))
      .agg(sum(col(valueCol).cast("long")).as("v"))
    // key-grain global windows over the per-key AGGREGATE (one row per
    // key, not per event): Gini/top-share is a total order over key
    // sums by definition — the report's contract, not an event pass
    val wAsc = Window.orderBy(col("v").asc, col("k").asc)
    val wDesc = Window.orderBy(col("v").desc, col("k").asc)
    val ranked = keyAgg
      .withColumn("__i", row_number().over(wAsc).cast("long"))
      .withColumn("__r", row_number().over(wDesc).cast("long"))
      // integer ceil(n·topPct/100) — head size, engine-identical
      .withColumn("__headn",
        expr(s"(count(1) over () * $topPct + 99) div 100"))
    ranked
      .agg(count(lit(1)).as("n_keys"), sum(col("v")).as("total"),
        sum(col("__i") * col("v")).as("__s1"),
        max(col("v")).as("__vmax"),
        sum(when(col("__r") <= col("__headn"), col("v"))
          .otherwise(lit(0L))).as("__head"))
      .select(
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        coalesce(col("total"), lit(0L)).as("total"),
        // DECIMAL(38,0) arithmetic: the Gini numerator is
        // O(n_keys · total · 1e6) and passes int64 around total ≈ 1e10
        // (sf0.1 cents already did — the bench caught it as an ANSI
        // overflow); scale-0 decimals keep every product EXACT (no
        // scale to lose) far past any realistic corpus, and `div`
        // lands back in a long
        when(col("n_keys") > 1 && col("total") > 0,
          expr("""(2 * CAST(__s1 AS DECIMAL(38,0))
                 |   - (CAST(n_keys AS DECIMAL(38,0)) + 1)
                 |     * CAST(total AS DECIMAL(38,0))) * 1000000
                 | div (CAST(n_keys AS DECIMAL(38,0))
                 |      * CAST(total AS DECIMAL(38,0)))""".stripMargin))
          .as("gini_ppm"),
        when(col("total") > 0,
          expr("CAST(__vmax AS DECIMAL(38,0)) * 1000000 div total"))
          .as("top1_ppm"),
        when(col("total") > 0,
          expr("CAST(__head AS DECIMAL(38,0)) * 1000000 div total"))
          .as(s"top${topPct}pct_ppm"))
  }

  /** JOIN-CARDINALITY planner: the EXACT inner-join output size
    * |A ⋈ B| = Σ_k cntA(k)·cntB(k) plus the keys that dominate it —
    * the report you run BEFORE committing a 100 TB join (it prices the
    * shuffle, predicts the blowup, and names the keys to salt; feeds
    * [[SkewJoin]] exactly like [[keySkew]] feeds the groupBy side,
    * but for the PAIRED fan-out, which single-side skew can miss).
    *
    * Cost: one map-side-combined count per side at key grain, one
    * key-grain join, bounded [[TopKAgg]] for the head — the data
    * tables are scanned once each and never joined. All-integer
    * (products and floor-ppm shares); keys must cast to BIGINT for
    * the top-k id slot (the [[keySkew]] rule).
    *
    * @return topK rows (rank, key, pair_rows, share_ppm) each
    *         carrying the totals (total_pair_rows, n_matched_keys)
    */
  def joinCardinality(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, topK: Int): DataFrame = {
    require(topK >= 1 && topK <= 10000, "topK in [1, 10000]")
    val ca = left.groupBy(col(leftKey).cast("long").as("key"))
      .agg(count(lit(1)).as("ca"))
    val cb = right.groupBy(col(rightKey).cast("long").as("key"))
      .agg(count(lit(1)).as("cb"))
    val prod = ca.join(cb, Seq("key"))
      .select(col("key"), (col("ca") * col("cb")).as("pair_rows"))
    val tot = prod.agg(sum(col("pair_rows")).as("total_pair_rows"),
      count(lit(1)).as("n_matched_keys"))
    prod
      .agg(TopKAgg.topK(col("pair_rows").cast("double"), col("key"), topK)
        .as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "p")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("p.id").as("key"), col("p.val").cast("long").as("pair_rows"))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("key"), col("pair_rows"),
        when(col("total_pair_rows") > 0,
          expr("pair_rows * 1000000L div total_pair_rows")).as("share_ppm"),
        coalesce(col("total_pair_rows"), lit(0L)).as("total_pair_rows"),
        coalesce(col("n_matched_keys"), lit(0L)).as("n_matched_keys"))
  }

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

  /** Pairwise Pearson correlation matrix over `cols` in ONE scan —
    * the multi-column dependence screen (feature redundancy, leakage
    * hints) run before modeling. One row per unordered pair:
    * `(col_a, col_b, n, corr_ppm)` with corr in floor-ppm of [−1, 1].
    *
    * Engine-replayable by construction: values quantize to
    * `floor(v·10^decimals)` exact integers; per-pair moment sums
    * (pairwise deletion — each pair sums only rows where BOTH sides
    * are non-null) aggregate in DECIMAL(38,0), which is exact and
    * reduction-order independent; only then does the Pearson formula
    * run in double — every engine derives the identical doubles from
    * identical integers through the identical expression, so the
    * floor-ppm result matches bit-for-bit. A raw `corr()` over doubles
    * would depend on distributed summation order.
    *
    * One map-side-combined aggregation produces all d(d−1)/2 · 6
    * conditional sums in a single pass (no per-pair jobs, no Expand);
    * the single result row explodes into pair grain. Per-value bound:
    * |scaled v| < 10^14 keeps every product within DECIMAL(38,0)'s
    * headroom at petabyte row counts (ANSI: overflow raises, never
    * wraps).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
      decimals: Int = 4): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    require(decimals >= 0 && decimals <= 6, s"decimals in [0, 6], got $decimals")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def scaled(c: String) =
      floor(col(c) * pow(lit(10.0), lit(decimals))).cast("decimal(38,0)")
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val both = col(a).isNotNull && col(b).isNotNull
      val (x, y) = (scaled(a), scaled(b))
      Seq(
        coalesce(sum(when(both, 1L).otherwise(0L)), lit(0L)).as(s"__n$i"),
        sum(when(both, x)).as(s"__sx$i"),
        sum(when(both, y)).as(s"__sy$i"),
        sum(when(both, x * x)).as(s"__sxx$i"),
        sum(when(both, y * y)).as(s"__syy$i"),
        sum(when(both, x * y)).as(s"__sxy$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val packed = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n$i").as("n"), col(s"__sx$i").cast("double").as("sx"),
        col(s"__sy$i").cast("double").as("sy"),
        col(s"__sxx$i").cast("double").as("sxx"),
        col(s"__syy$i").cast("double").as("syy"),
        col(s"__sxy$i").cast("double").as("sxy"))
    }
    val vx = col("p.n") * col("p.sxx") - col("p.sx") * col("p.sx")
    val vy = col("p.n") * col("p.syy") - col("p.sy") * col("p.sy")
    one.select(explode(array(packed: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.n"),
        // degenerate pairs (n < 2 or a constant side) have no defined
        // correlation — NULL, never a NaN that ANSI would throw on
        when(col("p.n") < 2L || vx <= 0.0 || vy <= 0.0,
            lit(null).cast("bigint"))
          .otherwise(floor(
            (col("p.n") * col("p.sxy") - col("p.sx") * col("p.sy")) /
              sqrt(vx) / sqrt(vy) * lit(1000000.0)).cast("bigint"))
        .as("corr_ppm"))
  }
}
