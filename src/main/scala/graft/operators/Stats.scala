package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numerically-EXACT distributed second-moment statistics (SURVEY
  * §3.3 profiling family — no reference counterpart): per-group
  * simple linear regression (y ~ x) and Pearson correlation from
  * DECIMAL power sums.
  *
  * Why not Spark's built-in `corr`/`covar_pop`: they accumulate running
  * doubles whose value depends on partial-aggregation ORDER — the same
  * data on a different partitioning gives a last-ulp-different answer,
  * which breaks reproducibility contracts (and any external replay).
  * Fixed-point inputs (here: 4 decimal places) make every power sum an
  * exact decimal — shuffle-order independent — and the final slope/
  * intercept/r arithmetic is a fixed sequence of IEEE double ops on
  * identical inputs, so any engine reproduces the result bit-for-bit
  * (the q01 DECIMAL-sum rule applied to second moments).
  *
  * 100 TB posture: ONE map-side-combined aggregation (6 sums per
  * group), no second pass, no sort — the textbook one-pass regression,
  * made deterministic.
  */
object Stats {

  /** Per-group n, slope, intercept, Pearson r of `yCol` on `xCol`.
    * Inputs are truncated to 4 decimal places (exact-decimal domain;
    * DECIMAL(14,4) keeps products within both engines' exact range);
    * outputs floor-truncated to 6 (the repo float rule). Groups with
    * zero x-variance yield null slope/intercept/r (vertical line) —
    * detected EXACTLY via min(x) = max(x), never from the
    * double-rounded variance (n·Σx² − (Σx)² computed in doubles lands
    * at ±ulp, not 0, for non-binary-representable constant x).
    *
    * Conditioning caveat (honest limits of the one-pass form): the
    * centered moments suffer catastrophic cancellation when the
    * variance is many orders below the raw second moment — the result
    * is still deterministic and engine-reproducible (identical IEEE
    * op sequence), but its RELATIVE accuracy degrades; pre-shift x/y
    * toward their approximate means if that regime matters.
    */
  def regression(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(14,4)")
    val y = col(yCol).cast("decimal(14,4)")
    val agged = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        // per-column non-null counts, only for the overflow guard below
        // (a null sum is legitimate when every value was null)
        count(x).as("nx"), count(y).as("ny"), count(x * y).as("nxy"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"),
        min(x).as("minx"), max(x).as("maxx"),
        min(y).as("miny"), max(y).as("maxy"))
    // same aggregate-overflow guard as [[moments]]: a power sum that
    // overflows decimal(38,8) must raise, not silently null the slope
    val sums = Seq("sx" -> "nx", "sy" -> "ny", "sxx" -> "nx",
      "sxy" -> "nxy", "syy" -> "ny").foldLeft(agged) {
      case (d, (c, nc)) => d.withColumn(c, loudSum(agged, c, nCol = nc))
    }
    val n = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxx, sxy, syy) =
      (col("sxx").cast("double"), col("sxy").cast("double"), col("syy").cast("double"))
    val covN = n * sxy - sx * sy   // n² · covariance
    val varXN = n * sxx - sx * sx  // n² · variance(x)
    val varYN = n * syy - sy * sy
    val xVaries = col("minx") =!= col("maxx") // exact decimal compare
    val yVaries = col("miny") =!= col("maxy")
    val slope = covN / varXN
    sums.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        when(xVaries, trunc6(slope)).as("slope"),
        when(xVaries, trunc6((sy - slope * sx) / n)).as("intercept"),
        when(xVaries && yVaries,
          trunc6(covN / sqrt(varXN * varYN))).as("r")): _*)
  }

  /** Per-group z-score outlier flags from the same DECIMAL power sums:
    * rows where |value − mean| > k·σ (population σ) within their
    * group. The z-score is computed scale-free as
    * z = (n·x − Σx) / √(n·Σx² − (Σx)²) — algebraically
    * (x − mean)/σ with both sides multiplied by n, so no division by n
    * ever happens and the only float ops are a fixed sequence on
    * exact-decimal inputs (bit-identical in any engine, the
    * [[regression]] rule). Constant groups (min = max, exact decimal
    * compare) yield no outliers rather than a 0/0.
    *
    * 100 TB posture: one map-side-combined aggregation to a
    * groups-sized sums table, then ONE more scan where the sums join
    * back — AQE broadcasts the (tiny, exact-sized) sums side, so the
    * data never shuffles. The standard two-pass outlier scan; pass two
    * is narrow.
    *
    * Edge contract (each has a spec):
    *  - values outside the decimal(14,4) domain (|x| ≥ 1e10) RAISE
    *    instead of silently vanishing from the moments — the overflow
    *    row is exactly the extreme an outlier detector must not drop;
    *  - NULL group keys are a group (null-safe join), so their
    *    extremes are still flagged;
    *  - near-constant groups whose double-rounded n·Σx² − (Σx)²
    *    cancels to ≤ 0 yield NO flags (a NaN/Inf z under Spark's
    *    NaN-is-largest ordering would otherwise flag EVERY row).
    */
  def outliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 3.0): DataFrame =
    flagAgainstMoments(df, moments(df, groupCols, valueCol),
      groupCols, valueCol, k)

  /** The exact-decimal per-group moment table [[outliers]] flags
    * against: (groupCols, __n, __sx, __sxx, __minx, __maxx). Public so
    * a PRECOMPUTED batch moment table can gate a live stream
    * ([[graft.streaming.StreamOps.outlierGate]]) or tomorrow's batch —
    * the flag stage then never rescans history.
    */
  def moments(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val x = scaledX(valueCol)
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(count(x).as("__n"), // count(x): null values join no moment
        sum(x).as("__sx"), sum(x * x).as("__sxx"),
        min(x).as("__minx"), max(x).as("__maxx"))
    // AGGREGATE overflow guard: each x² fits decimal(29,8), but the SUM
    // aggregates into decimal(38,8) — at ~1e10+ rows near the 1e10 value
    // bound Σx² can overflow THAT, and non-ANSI Spark nulls the sum
    // silently, which would make varN null and the flag/normalize pass
    // emit zero flags/NULLs (the exact silent-vanish this operator's
    // per-value guard exists to prevent). Convert the silent null into
    // the same pointed raise in both ANSI modes.
    agged
      .withColumn("__sx", loudSum(agged, "__sx"))
      .withColumn("__sxx", loudSum(agged, "__sxx"))
  }

  /** A sum column that RAISES (both ANSI modes) if aggregate decimal
    * overflow nulled it: null sum + nonzero count has no other cause —
    * `sum` skips nulls, so an all-null group has count 0.
    */
  private def loudSum(
      d: DataFrame, c: String, nCol: String = "__n"): org.apache.spark.sql.Column =
    when(col(nCol) === 0 || col(c).isNotNull, col(c))
      .otherwise(raise_error(lit(s"Stats: aggregate $c overflowed " +
        "decimal(38,8) — the group's power sum exceeds the exact range; " +
        "rescale the column or split the group"))
        .cast(d.schema(c).dataType.sql))

  /** Flag stage of [[outliers]], reusable against an EXTERNAL moments
    * relation (stream-static or cross-batch): stateless join + narrow
    * filter, so it runs unchanged on a streaming `df`.
    */
  private[graft] def flagAgainstMoments(
      df: DataFrame,
      moments: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double): DataFrame = {
    require(k > 0, "k must be positive")
    val x = scaledX(valueCol)
    val n = col("__n").cast("double")
    val (sx, sxx) = (col("__sx").cast("double"), col("__sxx").cast("double"))
    val varN = n * sxx - sx * sx
    val z = (n * x.cast("double") - sx) / sqrt(varN)
    nullSafeGroupJoin(df, moments, groupCols)
      .where(col("__minx") =!= col("__maxx") && varN > lit(0.0) &&
        abs(z) > lit(k))
      .withColumn("z", trunc6(z))
      .drop("__n", "__sx", "__sxx", "__minx", "__maxx")
  }

  /** Per-group feature NORMALIZATION from the same exact moments —
    * the data-prep twin of [[outliers]]: every row gains `z`
    * ((x − mean)/σ, scale-free form) and `minmax` ((x − min)/(max −
    * min) ∈ [0, 1]), both floor-truncated to 6. Degenerate groups
    * (constant, or variance cancelled to ≤ 0 in doubles) yield NULL
    * rather than NaN/Inf; null values stay null. Same two-pass shape:
    * one map-side-combined moments aggregation, one narrow join pass.
    */
  def normalize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val x = scaledX(valueCol)
    val n = col("__n").cast("double")
    val (sx, sxx) = (col("__sx").cast("double"), col("__sxx").cast("double"))
    val varN = n * sxx - sx * sx
    val varies = col("__minx") =!= col("__maxx")
    val z = (n * x.cast("double") - sx) / sqrt(varN)
    val mm = (x.cast("double") - col("__minx").cast("double")) /
      (col("__maxx").cast("double") - col("__minx").cast("double"))
    nullSafeGroupJoin(df, moments(df, groupCols, valueCol), groupCols)
      .withColumn("z", when(varies && varN > lit(0.0), trunc6(z)))
      .withColumn("minmax", when(varies, trunc6(mm)))
      .drop("__n", "__sx", "__sxx", "__minx", "__maxx")
  }

  /** Shared decimal-domain value expression: try_cast gives identical
    * loud-overflow behavior with or without ANSI mode (a plain cast is
    * silent-NULL without it). */
  private def scaledX(valueCol: String) = {
    val raw = col(valueCol)
    coalesce(raw.try_cast("decimal(14,4)"),
      when(raw.isNotNull, raise_error(concat(
        lit(s"Stats.outliers: $valueCol value "), raw.cast("string"),
        lit(" overflows the decimal(14,4) moment domain (|x| < 1e10); " +
          "rescale the column first")))
        .cast("decimal(14,4)")))
  }

  /** The repo float rule's 6-decimal floor truncation — ONE definition:
    * this is the cross-engine hash-match contract, so every operator
    * and every oracle replay must share it.
    */
  private[graft] def trunc6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 1e6) / 1e6

  /** Null-safe equi-join of a groups-sized `right` back onto `left`.
    * Empty `groupCols` = GLOBAL statistics: `right` is one row and the
    * join degrades to a broadcast of that row onto every left row
    * (whole-table outlier detection).
    *
    * Otherwise:
    * NULL group keys must match their own aggregate row (a plain
    * equi-join silently drops the whole null group), and renaming the
    * right side's keys to `__g_*` sidesteps self-join ambiguity. The
    * `__g_*` columns are dropped from the result.
    */
  private def nullSafeGroupJoin(
      left: DataFrame, right: DataFrame, groupCols: Seq[String]): DataFrame = {
    val r = groupCols.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    groupCols.foldLeft(left.join(r, cond))((d, c) => d.drop(s"__g_$c"))
  }

  /** EQUI-DEPTH quantile binning: each row gains the quantile bucket
    * (0..nBins−1) of its value within its group — the monotone feature
    * binning step of ML data prep ([[normalize]]'s ordinal sibling).
    *
    * Boundaries are `percentile_disc` aggregates (SQL-standard: the
    * smallest value whose cumulative distribution ≥ b/nBins) — ACTUAL
    * data values, so unlike interpolated percentiles there is no float
    * arithmetic an external engine could round differently: the oracle
    * replays the definition literally (min value with cume_dist ≥ p)
    * and both sides compare against identical stored doubles. Bucket =
    * count of boundaries STRICTLY below the value (values equal to a
    * boundary fall in the lower bucket); null values get a null bin;
    * all-null groups yield null boundaries → null bins, rows preserved.
    *
    * 100 TB posture vs `ntile`: ntile is a per-group WINDOW SORT of
    * every row; this is one map-side-combined boundary aggregation to a
    * groups-sized table + one narrow join pass (AQE broadcasts the
    * boundary side) — the two-pass shape of [[outliers]]/[[normalize]],
    * no row ever sorts. (percentile_disc sorts WITHIN the aggregation
    * buffer per group, like [[robustOutliers]]'s exact medians.)
    */
  def equiDepthBins(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val x = col(valueCol)
    val bcols = (1 until nBins).map(b =>
      expr(s"percentile_disc(${b.toDouble / nBins}d) " +
        s"WITHIN GROUP (ORDER BY `$valueCol`)").as(s"__q$b"))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(bcols.head, bcols.tail: _*)
    val bin = (1 until nBins)
      .map(b => when(x > col(s"__q$b"), 1).otherwise(0))
      .reduce(_ + _)
    nullSafeGroupJoin(df, bounds, groupCols)
      .withColumn("bin", when(x.isNotNull && col("__q1").isNotNull, bin))
      .drop((1 until nBins).map(b => s"__q$b"): _*)
  }

  /** ROBUST per-group outliers: |value − median| > k · 1.4826 · MAD
    * (median absolute deviation), the detector that survives the
    * heavy-tailed distributions where [[outliers]]'s mean/σ are
    * themselves dragged by the extremes. Two exact medians per group
    * (Spark's exact `percentile`), each one aggregation.
    *
    * Exactness across engines: inputs are fixed-point with `decimals`
    * places, so scaling by 10^decimals makes every value an integer;
    * a median of integers is k or k + 0.5, and |2·x − 2·median| is an
    * integer again — so BOTH median stages run on integers, every
    * intermediate is an exact small double, and the final flag
    * comparison is the same IEEE sequence in Spark and the DuckDB
    * replay (the continuous-percentile interpolation lo + (hi−lo)·0.5
    * is exact rational arithmetic on integers in any engine).
    * The fixed-point contract is ENFORCED, not assumed: a value with
    * more than `decimals` fractional places raises (engines disagree
    * on sub-precision — Spark's decimal→long cast truncates where
    * DuckDB's rounds, so silently accepting such input would produce
    * engine-dependent flag sets). Values that overflow the scaled
    * decimal domain raise too (try_cast guard as in [[outliers]]);
    * groups with MAD = 0 (a majority at the median) yield no flags
    * rather than dividing by zero.
    *
    * 100 TB posture: two aggregation passes (exact percentile sorts
    * WITHIN the aggregation buffer per group, no global sort) + two
    * narrow joins of groups-sized tables that AQE broadcasts. Use
    * [[Sketches.histQuantiles]] when approximate quantiles are
    * acceptable and one pass matters more.
    */
  /** Exponential time-decay aggregate with an engine-replayable
    * integer core — the "recency-weighted engagement" score behind
    * freshness-biased sampling mixes (newer documents weigh more) and
    * user activity ranking. Per key:
    * `score = Σ_days floor(daysum_scaled / 2^(age div halfLife))`,
    * where `daysum_scaled` is the exact integer sum of
    * `floor(value·10⁴)` on that (key, day) and age is measured from
    * the GLOBAL max day (the data's own "now" — no wall clock, so the
    * result is a pure function of the input).
    *
    * Why this shape instead of `sum(value · exp(-λ·age))`:
    * float-weighted sums depend on distributed reduction order, so two
    * runs of the same job can disagree in the last ulp. Here every
    * per-day partial is an exact integer, each decayed term is an
    * exact IEEE op pair (division by a power of two is exact; floor is
    * exact), and the final sum is integer — bit-identical on ANY
    * partitioning and ANY engine. Decay is quantized to half-life
    * steps (2^-k), the resolution that matters for mixing weights.
    *
    * 100 TB posture: one map-side-combined (key, day) aggregation
    * (the calendar bounds distinct days, so the grain is ~keys×days),
    * then a key-grain re-aggregation; the anchor is a broadcast
    * one-row join. Shifts cap at 62 (beyond that the term is 0 for
    * any representable daysum); per-day sums overflow LOUDLY (ANSI
    * long sum) rather than drift.
    */
  def decayedSum(
      df: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be >= 1")
    val src = df.select(col(keyCol).as("key"), col(dayCol).as("day"),
        floor(col(valueCol) * lit(10000)).cast("long").as("vs"))
      .where(col("vs").isNotNull)
    val anchor = src.agg(max(col("day")).as("anchor"))
    val perDay = src.groupBy(col("key"), col("day"))
      .agg(sum(col("vs")).as("daysum"), count(lit(1)).as("n"))
    perDay.crossJoin(broadcast(anchor))
      .withColumn("d",
        least(expr(s"(anchor - day) div $halfLifeDays"), lit(62L)))
      .withColumn("term",
        floor(col("daysum").cast("double") / pow(lit(2.0), col("d"))).cast("long"))
      .groupBy(col("key"))
      .agg(sum(col("term")).as("score_scaled"), sum(col("n")).as("n_events"))
  }

  /** CUSUM mean-shift detection over a per-key integer series — the
    * page-one sequential change detector (Page 1954), made distributed:
    * the recursion S_i = max(0, S_{i−1} + d_i) is NOT a fold here but
    * the closed form S_i = P_i − min(0, min_{j≤i} P_j) with P the
    * plain prefix sum of d — two window expressions over ONE
    * partition-by-key sort, no iteration, no driver loop. (Identity:
    * both sides satisfy the same recurrence; induction on i.)
    *
    * Two-sided with slack: d⁺ = x − target − slack (upward drift),
    * d⁻ = target − x − slack (downward), each with its own prefix
    * stream; `target` is the per-key floor mean computed by a
    * whole-partition window aggregate in the SAME shuffle (no join
    * pass). All arithmetic is 64-bit integer — exact, replayable,
    * partitioning-independent.
    *
    * 100 TB posture: one shuffle on the key; the window frames are
    * running (no O(n²) re-scan); series length per key is the day
    * grain, so partitions are calendar-bounded. The caller aggregates
    * to (key, t, x) grain FIRST (like q64/q65's day-grain rule).
    *
    * @param slack     per-step dead-band in value units (≥ mean−floor
    *                  bias 1 — slack 0 turns floor-mean drift into a
    *                  false ramp)
    * @param threshold flag level h: shift_up/shift_dn = cusum > h
    */
  def cusumShift(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      slack: Long,
      threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRun = Window.partitionBy(col("k")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).as("k"), col(orderCol).as("t"),
        col(valueCol).cast("long").as("x"))
      .withColumn("target",
        expr("sum(x) over (partition by k) div count(x) over (partition by k)"))
      .withColumn("pup", sum(col("x") - col("target") - lit(slack)).over(wRun))
      .withColumn("pdn", sum(col("target") - col("x") - lit(slack)).over(wRun))
      .withColumn("cusum_up", col("pup") - least(lit(0L), min(col("pup")).over(wRun)))
      .withColumn("cusum_dn", col("pdn") - least(lit(0L), min(col("pdn")).over(wRun)))
      .select(col("k"), col("t"), col("x"), col("target"),
        col("cusum_up"), col("cusum_dn"),
        (col("cusum_up") > threshold).as("shift_up"),
        (col("cusum_dn") > threshold).as("shift_dn"))
  }

  /** Population Stability Index between two snapshots of a numeric
    * column — the standard "did this feature's DISTRIBUTION move"
    * score (PSI < 0.1 stable, > 0.25 shifted, by the usual rule of
    * thumb — here in e6 units: 100_000 / 250_000), the quantitative
    * sibling of Profile.drift's null/cardinality screen.
    *
    * Binning is fixed-boundary equi-width (`least(floor(v) div
    * binWidth, maxBin)`, negatives clamp to bin 0) — boundaries are
    * CONSTANTS, so the bin of a value never depends on the other
    * snapshot (quantile bins would re-bin historical data every
    * release). ALL maxBin+1 bins materialize (a `spark.range` frame,
    * not the observed bins): an empty bin still contributes PSI mass
    * under smoothing, and dropping it would understate drift exactly
    * where it's largest.
    *
    * Exactness: counts are integers; shares are Laplace-smoothed
    * floor-ppm `(n+1)·1e6 div (N + bins)`; the per-bin term
    * floor((pa_ppm − pb_ppm) · ln(pa_ppm / pb_ppm)) is one ln on a
    * ratio of exact integers (the q36/q113 ln-parity precedent) and
    * sums as integers — reduction-order independent. The smoothing
    * also makes every ratio finite: no 0/0, no ±∞, on any input.
    *
    * 100 TB posture: one map-side-combined count per snapshot at bin
    * grain (≤ maxBin+1 rows each), then report-grain joins; the
    * whole-report window that attaches psi_total_e6 runs over ≤
    * maxBin+1 rows by construction.
    */
  def psi(
      before: DataFrame,
      after: DataFrame,
      valueCol: String,
      binWidth: Long,
      maxBin: Int): DataFrame = {
    require(binWidth >= 1, "binWidth must be positive")
    require(maxBin >= 1 && maxBin <= 100000, "maxBin in [1, 1e5]")
    val spark = before.sparkSession
    val nBins = maxBin + 1
    def binned(df: DataFrame, s: String) = df
      .where(col(valueCol).isNotNull)
      .select(expr(s"least(greatest(cast(floor(`$valueCol`) as long), 0L)" +
        s" div ${binWidth}L, ${maxBin}L)").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(s"n_$s"))
    val bins = spark.range(nBins).select(col("id").as("bin"))
    val counts = bins
      .join(binned(before, "a"), Seq("bin"), "left")
      .join(binned(after, "b"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = counts.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    val shared = counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_a"), col("n_b"),
        expr(s"(n_a + 1L) * 1000000L div (__ta + $nBins)").as("share_a_ppm"),
        expr(s"(n_b + 1L) * 1000000L div (__tb + $nBins)").as("share_b_ppm"))
      .withColumn("term_e6",
        floor((col("share_a_ppm") - col("share_b_ppm")) *
          log(col("share_a_ppm").cast("double") / col("share_b_ppm")))
          .cast("long"))
    import org.apache.spark.sql.expressions.Window
    // report-grain window: ≤ maxBin+1 rows by construction
    shared.withColumn("psi_total_e6",
      sum(col("term_e6")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
  }

  /** Null IMPUTATION with the per-group discrete median — the feature-
    * prep step that fills gaps without inventing values: the fill is
    * `percentile_disc(0.5)` (an actual observed value, SQL-standard
    * lower median), never an interpolated float, so the imputed column
    * keeps the source's exact fixed-point domain and the whole output
    * is engine-replayable. Values enter as floor-scaled integers
    * (`decimals` places, the attribution cents rule).
    *
    * Groups where EVERY value is null have no median — their nulls
    * stay null with `was_imputed=false` (inventing a global fallback
    * silently couples groups; compose a second pass if you want one).
    * One median aggregation per group + one narrow fill pass; AQE
    * broadcasts the group-grain median table.
    *
    * @return input key/group columns + `value_scaled` (filled) +
    *         `was_imputed`
    */
  def imputeMedian(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      decimals: Int = 2): DataFrame = {
    require(decimals >= 0 && decimals <= 4, "decimals in [0, 4]")
    val scale = math.pow(10, decimals).toLong
    val base = df.select(
      (groupCols :+ idCol).map(col) :+
        floor(col(valueCol) * scale).cast("long").as("__sv"): _*)
    val med = base.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY __sv)")
        // discrete median of longs IS a long — Spark's percentile_disc
        // merely returns it as double; the cast is exact by definition
        .cast("long").as("__med"))
    nullSafeGroupJoin(base, med, groupCols)
      .select(
        (groupCols :+ idCol).map(col) :+
          coalesce(col("__sv"), col("__med")).as("value_scaled") :+
          (col("__sv").isNull && col("__med").isNotNull).as("was_imputed"): _*)
  }

  /** ROLLING outlier flags over a per-key ordered series: x deviates
    * more than k·σ from the trailing-w-row mean (the "is today's value
    * anomalous vs the recent past" monitor, where the global [[outliers]]
    * screen would blur regime changes away). The current row is
    * EXCLUDED from its own baseline (self-inclusion dilutes the very
    * spike being tested).
    *
    * Exactness without sqrt: values are integers, so the flag
    *   |x − μ_w| > k·σ_w  ⇔  (n·x − Σ)² · 100 > kTenths² · (n·Σx² − Σ²)
    * compares INTEGERS after squaring (multiply by n² to clear the
    * denominators; k = kTenths/10, so k²·100 = kTenths² exactly) — no
    * float, no sqrt, no engine divergence, the q75 z-score argument
    * applied to window frames. Windows shorter than `minRows` emit
    * null flags (a 2-row baseline flags everything).
    *
    * Overflow bound (documented, raising in ANSI): with |x| < B and
    * window w, the squared left side needs (w·B)² · 100 < 2^63 —
    * B < 9.6e7/w at w=30 (values are user-scaled integers; rescale or
    * shrink w beyond that).
    *
    * One key-partitioned sort carries both frame aggregates — the
    * CUSUM shuffle shape, with a ROWS frame instead of prefix sums.
    */
  def rollingOutliers(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      window: Int,
      kTenths: Int,
      minRows: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 2 && window <= 10000, "window in [2, 10000]")
    require(kTenths >= 1 && kTenths <= 1000, "kTenths in [1, 1000]")
    require(minRows >= 2 && minRows <= window, "minRows in [2, window]")
    val w = Window.partitionBy(col("k")).orderBy(col("t"))
      .rowsBetween(-window, -1)
    df.select(col(keyCol).as("k"), col(orderCol).as("t"),
        col(valueCol).cast("long").as("x"))
      .withColumn("__n", count(col("x")).over(w))
      .withColumn("__s", sum(col("x")).over(w))
      .withColumn("__ss", sum(col("x") * col("x")).over(w))
      .withColumn("is_outlier",
        when(col("__n") >= minRows && col("x").isNotNull,
          (col("__n") * col("x") - col("__s")) *
            (col("__n") * col("x") - col("__s")) * lit(100L) >
          lit(kTenths.toLong * kTenths) *
            (col("__n") * col("__ss") - col("__s") * col("__s"))))
      .select(col("k"), col("t"), col("x"), col("__n").as("baseline_rows"),
        col("is_outlier"))
  }

  def robustOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 3.0,
      decimals: Int = 2): DataFrame = {
    require(k > 0, "k must be positive")
    require(decimals >= 0 && decimals <= 4, "decimals in [0, 4]")
    val scale = math.pow(10, decimals).toLong
    val raw = col(valueCol)
    // sub-precision check: the scaled value must already BE an integer —
    // truncate-vs-round divergence between engines makes silently
    // accepting finer input an oracle-splitting bug. The check runs on a
    // decimal(18,8) image of the RAW double (same |x| < 1e10 domain,
    // four extra fractional digits), so a 5th-plus decimal place can't
    // be rounded away by a decimal(14,4) cast BEFORE the check — a
    // value like 1.00005 at decimals=4 must raise, not round-and-pass
    // (and a HALF_UP-vs-cast tie at the 5th place can't split engines)
    val scaled = raw.try_cast("decimal(18,8)") * scale
    val sv = coalesce(
      when(scaled === floor(scaled), scaled.try_cast("long")),
      when(raw.isNotNull, raise_error(concat(
        lit(s"Stats.robustOutliers: $valueCol value "), raw.cast("string"),
        lit(s" is not fixed-point with $decimals decimal places, or " +
          "overflows the decimal(18,8) domain (|x| < 1e10); rescale first")))
        .cast("long"))).as("__sv")
    val base = df.withColumn("__sv", sv)
    // stage 1: 2·median as an exact integer-valued double
    val med = base.groupBy(groupCols.map(col): _*)
      .agg((expr("percentile(__sv, 0.5)") * 2).as("__med2"))
    // stage 2: 4·MAD from the integer deviations |2·x − 2·median|
    val dev = nullSafeGroupJoin(base, med, groupCols)
      .withColumn("__d2", abs(col("__sv") * 2 - col("__med2")))
    val mad = dev.groupBy(groupCols.map(col): _*)
      .agg((expr("percentile(__d2, 0.5)") * 2).as("__mad4"))
    val sigma = lit(1.4826) * (col("__mad4") / 4.0) / scale
    val rz = (col("__d2") / 2.0 / scale) / sigma
    nullSafeGroupJoin(dev, mad, groupCols)
      .where(col("__mad4") > 0 && rz > lit(k))
      .withColumn("robust_z", trunc6(rz))
      .drop("__sv", "__d2", "__med2", "__mad4")
  }

  /** Per-group PERCENT-RANK normalization — the rank-based feature
    * transform ([[normalize]]'s distribution-free sibling): each row
    * gains its SQL-standard rank (ties share the minimum rank) and
    * `pct_e6` = (rank − 1)·1e6 div (n − 1), the percent_rank
    * definition in EXACT integer arithmetic — no float ever appears,
    * so any engine replays it bit-for-bit (rank is value-determined
    * even though row order among ties is not). Single-member groups
    * get null pct (0/0); null values rank null but keep their rows.
    *
    * 100 TB posture: ONE shuffle on the group key shared by the rank
    * window and the count — the window is always group-partitioned
    * (never global), so this is the partitioned-window shape PlanSpec
    * enforces everywhere.
    */
  def rankNormalize(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "rankNormalize: need group columns " +
      "(a global rank of a 100 TB table is a single-partition sort; " +
      "bucket first)")
    import org.apache.spark.sql.expressions.Window
    // nulls LAST explicitly: Spark's asc default is nulls-first, the
    // SQL-standard (and DuckDB) default is nulls-last — null rows are
    // masked from the output rank either way, but they must not OFFSET
    // the live rows' ranks differently per engine
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol).asc_nulls_last)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("rnk",
        when(col(valueCol).isNotNull, rank().over(w).cast("long")))
      .withColumn("__nv", count(col(valueCol)).over(wg))
      .withColumn("pct_e6",
        when(col("rnk").isNotNull && col("__nv") > 1,
          expr("(rnk - 1) * 1000000L div (__nv - 1)")))
      .drop("__nv")
  }

  /** NEAREST-RANK winsorized group summary: per group, the p-low /
    * p-high percentile bounds (nearest-rank, i.e. ACTUAL data values —
    * deliberately not interpolated: an interpolated bound is a float
    * blend, and summing clamped floats is reduction-order-dependent;
    * clamping to member values keeps the whole pipeline in the exact
    * scaled-long domain), the count clamped at each side, and the
    * winsorized mean as a floor-e6 integer — the robust location
    * estimate that tolerates fat tails without [[robustOutliers]]'
    * row-level verdicts.
    *
    * Ranks: bound_low = value at row ⌈pLowPpm·n/1e6⌉ (min 1),
    * bound_high = value at row ⌈pHighPpm·n/1e6⌉ of the group's
    * ascending sort — value-at-position is well-defined under ties
    * regardless of tie order. Inputs go through the [[moments]]
    * decimal(14,4) domain guard; null values drop from the summary.
    *
    * 100 TB posture: one group-partitioned window pass for positions,
    * one map-side-combined aggregate for the bounds, one narrow
    * clamp+sum pass with the groups-sized bounds broadcast back — no
    * global sort, no second scan of raw data.
    */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      pLowPpm: Long = 50000L,
      pHighPpm: Long = 950000L): DataFrame = {
    require(pLowPpm >= 0 && pHighPpm <= 1000000L && pLowPpm < pHighPpm,
      "ppm bounds must satisfy 0 <= low < high <= 1e6")
    import org.apache.spark.sql.expressions.Window
    val x4 = (scaledX(valueCol) * lit(10000)).cast("long")
    val rows = df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ x4.as("__x4"): _*)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__x4").asc)
    val ranked = rows.withColumn("__rn", row_number().over(w).cast("long"))
    // nearest-rank positions from the group size, exact integer ceil
    val counts = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__lo_rn",
        greatest(expr(s"($pLowPpm * __n + 999999) div 1000000"), lit(1L)))
      .withColumn("__hi_rn",
        greatest(expr(s"($pHighPpm * __n + 999999) div 1000000"),
          col("__lo_rn")))
    val bounds = nullSafeGroupJoin(ranked, counts, groupCols)
      .where(col("__rn") === col("__lo_rn") || col("__rn") === col("__hi_rn"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        min(when(col("__rn") === col("__lo_rn"), col("__x4"))).as("__lo4"),
        max(when(col("__rn") === col("__hi_rn"), col("__x4"))).as("__hi4"))
    val clamped = least(greatest(col("__x4"), col("__lo4")), col("__hi4"))
    nullSafeGroupJoin(nullSafeGroupJoin(rows, counts, groupCols),
        bounds, groupCols)
      .withColumn("__c4", clamped)
      .groupBy(groupCols.map(col) :+ col("__n").as("n"): _*)
      .agg(
        min(col("__lo4")).as("lo_e4"),
        min(col("__hi4")).as("hi_e4"),
        sum((col("__x4") < col("__lo4")).cast("long")).as("n_low"),
        sum((col("__x4") > col("__hi4")).cast("long")).as("n_high"),
        expr("sum(__c4)").as("__sc4"))
      .withColumn("win_mean_e6", expr("__sc4 * 100L div n"))
      .drop("__sc4")
  }

  /** Exact WEIGHTED percentile per group — "the order size at which
    * half the QUANTITY has shipped" style questions, where the plain
    * percentile ([[equiDepthBins]]' boundaries) answers the wrong
    * thing because rows carry different mass. Definition (lower
    * weighted percentile, SQL-standard discrete flavor): the smallest
    * value v whose cumulative weight (over the group sorted by value,
    * ties by value only) reaches `pPpm` of the group's total weight —
    * cumW(v) · 1e6 ≥ pPpm · W. All-integer: values go through the
    * decimal(14,4)→e4-long domain, weights must be non-negative
    * integers (guarded — fractional or negative mass has no
    * cumulative-order meaning), and the threshold compare multiplies
    * longs under the documented W < 9.2e12 bound.
    *
    * 100 TB shape: one group-partitioned window for the cumulative
    * weight (value-ordered — ties share a cum value via a RANGE-style
    * self max, so equal values are one atomic step), one
    * map-side-combined total, one narrow filter + min aggregation.
    *
    * @return per group: (groupCols..., w_total, p_value_e4)
    */
  def weightedPercentile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      pPpm: Long): DataFrame = {
    require(pPpm >= 1 && pPpm <= 1000000L, "pPpm in [1, 1e6]")
    import org.apache.spark.sql.expressions.Window
    val wRaw = col(weightCol)
    val wInt = coalesce(wRaw.try_cast("decimal(14,0)"),
      when(wRaw.isNotNull, raise_error(concat(
        lit(s"Stats.weightedPercentile: $weightCol value "),
        wRaw.cast("string"),
        lit(" is not a non-negative integer weight < 1e14; scale or " +
          "floor the weight column first")))
        .cast("decimal(14,0)"))).cast("long")
    val guarded = when(wInt < 0 || wRaw.cast("double") =!= wInt.cast("double"),
      raise_error(concat(
        lit(s"Stats.weightedPercentile: $weightCol value "),
        wRaw.cast("string"),
        lit(" is not a non-negative integer weight; fractional/negative " +
          "mass has no cumulative-order meaning — rescale first")))
        .cast("long")).otherwise(wInt)
    val rows = df.where(col(valueCol).isNotNull && wRaw.isNotNull)
      .select(groupCols.map(col) :+
        (scaledX(valueCol) * lit(10000)).cast("long").as("__x4") :+
        guarded.as("__w"): _*)
    // cum weight over values ASC; equal values form ONE step (range
    // frame up to current value), so ties cannot split the mass
    val wv = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__x4").asc).rangeBetween(Window.unboundedPreceding, 0)
    val withCum = rows.withColumn("__cw", sum(col("__w")).over(wv))
    val totals = rows.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__w")).as("w_total"))
    nullSafeGroupJoin(withCum, totals, groupCols)
      .where(col("__cw") * lit(1000000L) >= lit(pPpm) * col("w_total"))
      .groupBy(groupCols.map(col) :+ col("w_total"): _*)
      .agg(min(col("__x4")).as("p_value_e4"))
  }

  /** QUANTILE NORMALIZATION across features — the cross-column
    * distribution aligner (microarray lineage, any multi-feature
    * calibration): each column's value at positional rank r is
    * replaced by the MEAN over all columns of their rank-r values, so
    * every column ends up with the identical marginal distribution.
    * Complete-case contract: a row with a null in ANY of `valueCols`
    * drops entirely (rank alignment requires equal column lengths —
    * the standard QN assumption, enforced rather than silently
    * misaligned).
    *
    * Exactness: values pass through the decimal(14,4)→e4-long domain;
    * positional ranks break ties by (value, id) — a deterministic
    * total order both engines share; the rank-mean is
    * `Σx4 div K` floor division on exact longs.
    *
    * 100 TB posture: the melt is a narrow K-way explode; each
    * column's rank is a column-partitioned window (K partitions —
    * the sort parallelism IS K, the same honest limit as
    * [[rankNormalize]]'s low-cardinality groups; QN is defined by
    * per-column total order, there is nothing cheaper that computes
    * it); the rank-mean aggregation and the join back are rank-grain.
    *
    * @return (idCol, feature, x_e4, rnk, norm_e4)
    */
  def quantileNormalize(
      df: DataFrame,
      idCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.size >= 2, "QN needs at least two columns")
    import org.apache.spark.sql.expressions.Window
    val complete = valueCols.foldLeft(df)((d, c) => d.where(col(c).isNotNull))
    val melted = complete.select(col(idCol).as("id"),
        explode(array(valueCols.map(c => struct(lit(c).as("feature"),
          (scaledX(c) * lit(10000)).cast("long").as("x_e4"))): _*)).as("m"))
      .select(col("id"), col("m.feature"), col("m.x_e4"))
    val w = Window.partitionBy(col("feature"))
      .orderBy(col("x_e4").asc, col("id").asc)
    val ranked = melted.withColumn("rnk", row_number().over(w).cast("long"))
    // FLOOR division (values may be negative, where `div` truncates
    // toward zero but the replay's `//` floors): the sum is an exact
    // long < 2^53, so the double floor is the same value in any engine
    val rankMean = ranked.groupBy(col("rnk"))
      .agg(floor(sum(col("x_e4")).cast("double") / lit(valueCols.size))
        .cast("long").as("norm_e4"))
    ranked.join(rankMean, Seq("rnk"))
      .select(col("id").as(idCol), col("feature"), col("x_e4"),
        col("rnk"), col("norm_e4"))
  }

  /** Two-sample z-test report over EXACT decimal moments — the A/B
    * readout (Welch-style unpooled variance): for each requested
    * (group_a, group_b) pair,
    *   z = (mean_a − mean_b) / √(var_a/n_a + var_b/n_b)
    * with means/variances derived from [[moments]]' decimal power sums,
    * so the inputs to the final double chain are exact and
    * partitioning-independent, and the chain itself is one fixed
    * parenthesization both engines replay (the [[regression]] rule).
    * Outputs trunc6 doubles; a pair with a missing group, n = 0, or
    * zero combined variance yields null z rather than NaN/Inf.
    *
    * 100 TB posture: ONE map-side-combined moments aggregation over
    * the measure column; the pair report is a literal-sized join of
    * the groups-sized moment table against itself — no second data
    * scan, no row-level shuffle.
    */
  def twoSampleZ(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "twoSampleZ: need at least one group pair")
    val spark = df.sparkSession
    import spark.implicits._
    val m = moments(df.select(col(groupCol).cast("string").as("__g"),
      col(valueCol)), Seq("__g"), valueCol)
    def side(tag: String) = m.select(
      col("__g").as(s"group_$tag"),
      col("__n").as(s"n_$tag"),
      col("__sx").cast("double").as(s"__sx_$tag"),
      col("__sxx").cast("double").as(s"__sxx_$tag"))
    val p = pairs.toDF("group_a", "group_b")
    def mean(tag: String) = col(s"__sx_$tag") / col(s"n_$tag").cast("double")
    def varOverN(tag: String) = {
      val n = col(s"n_$tag").cast("double")
      (n * col(s"__sxx_$tag") - col(s"__sx_$tag") * col(s"__sx_$tag")) /
        (n * n * n)
    }
    val denom = sqrt(varOverN("a") + varOverN("b"))
    p.join(broadcast(side("a")), Seq("group_a"), "left")
      .join(broadcast(side("b")), Seq("group_b"), "left")
      .select(col("group_a"), col("group_b"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        when(col("n_a") > 0, trunc6(mean("a"))).as("mean_a"),
        when(col("n_b") > 0, trunc6(mean("b"))).as("mean_b"),
        when(col("n_a") > 0 && col("n_b") > 0 && denom > lit(0.0),
          trunc6((mean("a") - mean("b")) / denom)).as("z"))
  }

  /** Exact ROC-AUC per group — the rank-sum (Mann-Whitney) identity
    *   AUC = (Σ_{positives} avgrank − P(P+1)/2) / (P·N)
    * with midrank tie handling, carried in EXACT integers end to end:
    * with r = RANK() over (score ASC) and c = |tie group|, the doubled
    * midrank 2·avgrank = 2r + c − 1 is an integer, so
    *   auc_e6 = (1e6 · (Σ2R − P(P+1))) DIV (2·P·N)
    * is one floor division — no float ranks, no reduction-order
    * dependence, identical in any engine. The model-eval primitive a
    * training pipeline runs after every scoring job.
    *
    * Cost shape: ONE rank sort per group (the unavoidable exact-AUC
    * sort — approximate AUC would bucket scores first), then a
    * map-side-combined aggregation. Null scores/labels are excluded
    * (a null score cannot be ranked; a null label is neither class).
    * Degenerate groups (P = 0 or N = 0) emit null auc_e6 rather than
    * dividing by zero. Int64 bound: Σ2R·1e6 ≤ 2n²·1e6 must stay under
    * 2^63 — fine to ~2e6 rows per group; beyond that, bucket scores
    * (the [[Sketches.histState]] path) instead of exact ranks.
    *
    * @param labelCol boolean column (true = positive)
    * @return groupCols ++ (n_pos, n_neg, auc_e6)
    */
  def rocAuc(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).asc)
    val tied = Window.partitionBy((groupCols.map(col) :+ col(scoreCol)): _*)
    val ranked = rows
      .withColumn("__r", rank().over(w).cast("long"))
      .withColumn("__c", count(lit(1)).over(tied))
    val p = sum(when(col(labelCol), 1L).otherwise(0L))
    val n = sum(when(col(labelCol), 0L).otherwise(1L))
    val s2 = sum(when(col(labelCol), lit(2L) * col("__r") + col("__c") - 1L)
      .otherwise(0L))
    ranked.groupBy(groupCols.map(col): _*)
      .agg(p.as("n_pos"), n.as("n_neg"), s2.as("__s2"))
      .withColumn("auc_e6",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(1000000L * (__s2 - n_pos * (n_pos + 1L))) DIV " +
            "(2L * n_pos * n_neg)")))
      .drop("__s2")
  }

  /** Dyadic EWMA — exponentially-weighted moving average with α = 1/2
    * over a fixed trailing window of `w` rows, in EXACT integers: the
    * truncated recursion s_i = Σ_{j=0..w-1} x_{i-j} / 2^(j+1) scaled
    * by 2^w is  num_i = Σ_j x_{i-j} · 2^(w-1-j)  — a lag chain with
    * power-of-two weights, so there is no float decay drift and the
    * result is identical in any engine / under any partitioning (the
    * same reasoning as [[decayedSum]]'s bucketed decay; this is the
    * row-grain sibling). Reported as ewma_milli = (1000·num) DIV 2^w.
    *
    * One window sort per key serves all w lags. Early rows (fewer than
    * w predecessors) use the available prefix — the missing terms are
    * zero, matching the truncated recursion started from s = 0.
    * Int64 bound: |x|·2^w·1000 must fit — with w ≤ 16 that is |x| <
    * 1.4e11, enforced nowhere (values are caller-scaled cents; the
    * multiply raises loudly under ANSI if exceeded).
    *
    * @param w trailing window length (2 ≤ w ≤ 16)
    */
  def dyadicEwma(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      w: Int): DataFrame = {
    require(w >= 2 && w <= 16, "w in [2, 16]")
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).asc)
    // non-negative contract enforced on the data path: Spark's DIV
    // truncates toward zero while DuckDB's // floors, so a negative
    // numerator would silently diverge between engines
    val checked = when(col(valueCol).isNull || col(valueCol) < 0,
      raise_error(lit("Stats.dyadicEwma: valueCol must be non-null and " +
        "non-negative (caller scales to cents)")).cast("long"))
      .otherwise(col(valueCol).cast("long"))
    val num = (0 until w).map { j =>
      coalesce(lag(checked, j).over(win), lit(0L)) *
        lit(1L << (w - 1 - j))
    }.reduce(_ + _)
    df.withColumn("__num", num)
      .withColumn("ewma_milli",
        expr(s"(1000L * __num) DIV ${1L << w}L"))
      .drop("__num")
  }

  /** Calibration (reliability) table — the companion readout to
    * [[rocAuc]]: fixed-boundary equi-width score bins (the [[psi]]
    * binning rule: floor to long, integer div, clamp to [0, maxBin] —
    * no float boundary arithmetic to diverge on), observed positive
    * rate per bin in floor-ppm. A well-calibrated scorer shows
    * pos_ppm rising monotonically with the bin; the gap per bin is
    * the thing a recalibration (Platt/isotonic) would fix. One
    * map-side-combined aggregation; empty bins are absent (a report
    * join against `spark.range` adds them if a dense axis is wanted —
    * [[psi]] does that; here absence IS information).
    *
    * @return groupCols ++ (bin, n, pos, pos_ppm)
    */
  def calibrationBins(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      labelCol: String,
      binWidth: Long,
      maxBin: Int): DataFrame = {
    require(binWidth >= 1, "binWidth must be positive")
    require(maxBin >= 1 && maxBin <= 100000, "maxBin in [1, 1e5]")
    val rows = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("bin",
        expr(s"least(greatest(cast(floor(`$scoreCol`) as long), 0L)" +
          s" div ${binWidth}L, ${maxBin}L)"))
    rows.groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"))
      .withColumn("pos_ppm", expr("pos * 1000000L DIV n"))
  }

  /** Precision/recall sweep at literal thresholds — the
    * operating-point table a model card ships with: per threshold t,
    * confusion counts for the rule `predict positive ⟺ score ≥ t`,
    * plus floor-ppm precision and recall. The threshold list explodes
    * from a literal array (bounded, like a search request batch), so
    * the fact scan happens ONCE and the fan-out is |thresholds| —
    * shuffle volume is groups × thresholds, never rows.
    *
    * Score/threshold comparison is on exact integers (caller scales —
    * cents/e4 — per the repo's fixed-point rule) so `>=` cannot
    * disagree between engines. Degenerate denominators emit null.
    *
    * @return groupCols ++ (threshold, tp, fp, fn, tn,
    *         precision_ppm, recall_ppm)
    */
  def prAtThresholds(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val rows = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("threshold",
        explode(typedlit(thresholds.sorted)))
    val pred = col(scoreCol) >= col("threshold")
    rows.groupBy((groupCols.map(col) :+ col("threshold")): _*)
      .agg(
        sum(when(pred && col(labelCol), 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !col(labelCol), 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && col(labelCol), 1L).otherwise(0L)).as("fn"),
        sum(when(!pred && !col(labelCol), 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_ppm",
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000L DIV (tp + fp)")))
      .withColumn("recall_ppm",
        when(col("tp") + col("fn") > 0,
          expr("tp * 1000000L DIV (tp + fn)")))
  }

  /** Spearman rank correlation — Pearson's r computed on AVERAGE
    * (midrank) ranks, the standard tie treatment. The midrank of a tie
    * run is fractional only by halves, so the DOUBLED midrank
    * `2·rank + tiecount − 1` (the [[rocAuc]] integer) keeps every rank
    * an exact integer; scaling both columns by 2 cancels in r. All
    * power sums accumulate as decimal(38,0) (shuffle-order
    * independent), and the closing formula — numerator and the two
    * variance terms cast to double, one sqrt, one division — is a
    * fixed IEEE op sequence any engine reproduces bit-for-bit.
    *
    * Rank-based = scale-free: inputs stay RAW (any orderable type —
    * no fixed-point domain guard, because only the ORDER of values
    * enters, and ordering/equality of the stored values is identical
    * in every engine). Rows with a null in either column drop
    * (complete-case — a one-sided null would bias the other column's
    * ranks). Zero-variance sides (all x tied) yield null rho.
    * Int64/decimal bound: doubled ranks ≤ 2n, so
    * n·Σax² ≤ 4n⁴ — exact through decimal(38,0) for n < 1e9 rows per
    * group (documented, far past aggregate grain).
    *
    * 100 TB posture: two group-partitioned rank windows (one sort per
    * column) + one map-side-combined aggregation. Like
    * [[rankNormalize]], group columns are required — a global rank is
    * a single-partition sort.
    */
  def spearman(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "spearman: need group columns " +
      "(a global rank of a 100 TB table is a single-partition sort; " +
      "bucket first)")
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((groupCols.map(col) :+
        col(xCol).as("__x") :+ col(yCol).as("__y")): _*)
    def ar2(c: String) = {
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(c).asc)
      val tied = Window.partitionBy((groupCols.map(col) :+ col(c)): _*)
      (lit(2L) * rank().over(w).cast("long") + count(lit(1)).over(tied)
        - lit(1L)).cast("decimal(38,0)")
    }
    val ranked = rows
      .withColumn("__ax", ar2("__x"))
      .withColumn("__ay", ar2("__y"))
    val agged = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__ax")).as("__sx"), sum(col("__ay")).as("__sy"),
        sum(col("__ax") * col("__ax")).as("__sxx"),
        sum(col("__ay") * col("__ay")).as("__syy"),
        sum(col("__ax") * col("__ay")).as("__sxy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val vx = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val vy = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    agged
      .withColumn("n", col("__n").cast("long"))
      .withColumn("rho_e6",
        when(vx > 0 && vy > 0,
          floor(num / sqrt(vx * vy) * 1e6).cast("long")))
      .drop("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")
  }

  /** Kendall tau-b — concordance rank correlation with the standard
    * tie correction, by EXACT pair counting over an aggregate-grain
    * series (daily sums, cohort rows — never raw facts: the pair scan
    * is O(n²) per group BY DEFINITION of the statistic, so the
    * operator RAISES when a group exceeds `maxRows`; pre-aggregate
    * first — the same aggregate-grain contract as [[acf]]).
    *
    * C/D/tie counts are integers from one self-equi-join on the group
    * key (`idCol` — a caller-supplied unique total order — deduplicates
    * mirror pairs via a < b); tau_b = (C − D) / √((n0−n1)(n0−n2)) with
    * n0 = n(n−1)/2, n1/n2 = x-tied/y-tied pair counts — one sqrt, one
    * division on doubles from exact int64s, floor-e6. Like [[spearman]]
    * it is rank-based, so values stay RAW: only COMPARISONS of stored
    * values enter, which every engine evaluates identically.
    */
  def kendallTau(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      xCol: String,
      yCol: String,
      maxRows: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((groupCols.map(col) :+ col(idCol).as("__id") :+
        col(xCol).as("__x") :+ col(yCol).as("__y")): _*)
      .withColumn("__gn",
        count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
      // guard lives in a FILTER, not a projected-then-dropped column —
      // Catalyst correctly prunes a dead projection, raise_error included
      .where(when(col("__gn") <= maxRows, lit(true))
        .otherwise(raise_error(concat(
          lit(s"Stats.kendallTau: a group has "), col("__gn").cast("string"),
          lit(s" rows > maxRows=$maxRows — the O(n²) pair scan needs " +
            "aggregate-grain input; pre-aggregate or raise maxRows"))
          .cast("boolean"))))
      .drop("__gn")
    val a = rows.select((groupCols.map(col) :+ col("__id").as("__ida") :+
      col("__x").as("__xa") :+ col("__y").as("__ya")): _*)
    val b = groupCols.foldLeft(
        rows.select((groupCols.map(col) :+ col("__id").as("__idb") :+
          col("__x").as("__xb") :+ col("__y").as("__yb")): _*))(
        (d, c) => d.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val pairs = a.join(b, cond && col("__ida") < col("__idb"))
    val (xa, xb, ya, yb) =
      (col("__xa"), col("__xb"), col("__ya"), col("__yb"))
    val agged = pairs.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__n0"),
        sum(when((xa < xb && ya < yb) || (xa > xb && ya > yb), 1L)
          .otherwise(0L)).as("__c"),
        sum(when((xa < xb && ya > yb) || (xa > xb && ya < yb), 1L)
          .otherwise(0L)).as("__d"),
        sum(when(xa === xb, 1L).otherwise(0L)).as("__tx"),
        sum(when(ya === yb, 1L).otherwise(0L)).as("__ty"))
    val denx = (col("__n0") - col("__tx")).cast("double")
    val deny = (col("__n0") - col("__ty")).cast("double")
    agged
      .withColumn("n_pairs", col("__n0"))
      .withColumn("concordant", col("__c"))
      .withColumn("discordant", col("__d"))
      .withColumn("tau_e6",
        when(denx > 0 && deny > 0,
          floor((col("__c") - col("__d")).cast("double")
            / sqrt(denx * deny) * 1e6).cast("long")))
      .drop("__n0", "__c", "__d", "__tx", "__ty")
  }

  /** Two-feature linear regression (y ~ b0 + b1·x1 + b2·x2) per group
    * — [[regression]]'s multiple-regression sibling, same exactness
    * design: DECIMAL power sums (shuffle-order independent), then the
    * normal-equation closed form as ONE fixed IEEE double sequence
    * (centered cross-moments A₁₁ A₁₂ A₂₂ B₁ B₂, Cramer's-rule solve,
    * R² = (b1·B1 + b2·B2)/SST) any engine replays bit-for-bit.
    * Coefficients floor-truncated to 6 (the repo float rule).
    *
    * Degenerate cases → null coefficients: a constant regressor
    * (detected EXACTLY via min = max, the [[regression]] rule) or a
    * singular/near-cancelled system (det ≤ 0 in doubles — perfectly
    * collinear regressors land there). Inputs pass the decimal(14,4)
    * domain guard; rows with any null drop (complete-case). Same
    * conditioning caveat as [[regression]]: the result is always
    * deterministic, but relative accuracy degrades when det is many
    * orders below A₁₁·A₂₂ — pre-center the regressors if that regime
    * matters.
    *
    * 100 TB posture: ONE map-side-combined aggregation (9 sums + 4
    * extrema per group), nothing else.
    */
  def regression2(
      df: DataFrame,
      groupCols: Seq[String],
      x1Col: String,
      x2Col: String,
      yCol: String): DataFrame = {
    // guard ONCE in a projection — evaluating the guarded cast inside
    // all ten aggregate expressions defeats codegen subexpression
    // sharing and was measured 10x slower at sf0.1
    val rows = df.where(col(x1Col).isNotNull && col(x2Col).isNotNull &&
        col(yCol).isNotNull)
      .select((groupCols.map(col) :+ scaledX(x1Col).as("__x1") :+
        scaledX(x2Col).as("__x2") :+ scaledX(yCol).as("__yv")): _*)
    val (x1, x2, y) = (col("__x1"), col("__x2"), col("__yv"))
    val agged = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x1).as("__s1"), sum(x2).as("__s2"), sum(y).as("__sy"),
        sum(x1 * x1).as("__s11"), sum(x2 * x2).as("__s22"),
        sum(x1 * x2).as("__s12"),
        sum(x1 * y).as("__s1y"), sum(x2 * y).as("__s2y"),
        sum(y * y).as("__syy"),
        min(x1).as("__m1l"), max(x1).as("__m1h"),
        min(x2).as("__m2l"), max(x2).as("__m2h"),
        min(y).as("__myl"), max(y).as("__myh"))
    val guarded = Seq("__s1", "__s2", "__sy", "__s11", "__s22", "__s12",
      "__s1y", "__s2y", "__syy").foldLeft(agged)((d, c) =>
      d.withColumn(c, loudSum(d, c, nCol = "n")))
    val dn = col("n").cast("double")
    def dbl(c: String) = col(c).cast("double")
    val a11 = dn * dbl("__s11") - dbl("__s1") * dbl("__s1")
    val a12 = dn * dbl("__s12") - dbl("__s1") * dbl("__s2")
    val a22 = dn * dbl("__s22") - dbl("__s2") * dbl("__s2")
    val b1n = dn * dbl("__s1y") - dbl("__s1") * dbl("__sy")
    val b2n = dn * dbl("__s2y") - dbl("__s2") * dbl("__sy")
    val det = a11 * a22 - a12 * a12
    val b1 = (b1n * a22 - b2n * a12) / det
    val b2 = (b2n * a11 - b1n * a12) / det
    val b0 = (dbl("__sy") - b1 * dbl("__s1") - b2 * dbl("__s2")) / dn
    val sst = dn * dbl("__syy") - dbl("__sy") * dbl("__sy")
    val ok = col("__m1l") =!= col("__m1h") &&
      col("__m2l") =!= col("__m2h") && det > lit(0.0)
    guarded
      .withColumn("b0", when(ok, trunc6(b0)))
      .withColumn("b1", when(ok, trunc6(b1)))
      .withColumn("b2", when(ok, trunc6(b2)))
      .withColumn("r2",
        when(ok && col("__myl") =!= col("__myh") && sst > lit(0.0),
          trunc6((b1 * b1n + b2 * b2n) / sst)))
      .drop("__s1", "__s2", "__sy", "__s11", "__s22", "__s12",
        "__s1y", "__s2y", "__syy", "__m1l", "__m1h", "__m2l", "__m2h",
        "__myl", "__myh")
  }

  /** Deterministic bootstrap confidence interval for a group mean —
    * the uncertainty readout an A/B or data-quality report ships with,
    * RNG-free so any engine replays every resample: draw (b, i) of
    * resample b picks the row whose dense index is
    * `hash60(salt, group ␂ b ␂ i) mod n` (the content-addressed draw
    * rule of [[graft.operators.Sampling]]), resample means are exact
    * floor-milli integers `(1000·Σ) div n`, and the CI bounds are
    * NEAREST-RANK percentiles of the nResamples means (actual member
    * values — the [[winsorize]] no-interpolation rule) under the total
    * order (mean ASC, b ASC).
    *
    * Aggregate-grain contract: the input is a SERIES (day sums, cohort
    * rows), never raw facts — the resample grid is n·nResamples rows
    * BY DEFINITION of the bootstrap. `idxCol` must be a dense 0..n−1
    * index per group; the operator VERIFIES (count = distinct count,
    * min 0, max n−1) and raises, because a silent gap would bias every
    * draw toward the surviving rows. Values must be non-negative
    * longs (caller-scaled cents; floor-div of a negative sum diverges
    * between engines — the [[dyadicEwma]] rule).
    *
    * 100 TB posture: one grid explode (bounded fan-out nResamples),
    * one equi-join back on (group, idx), one map-side-combined mean
    * aggregation, one window over nResamples rows per group.
    */
  def bootstrapMeanCI(
      df: DataFrame,
      groupCols: Seq[String],
      idxCol: String,
      valueCol: String,
      nResamples: Int = 200,
      loPpm: Long = 25000L,
      hiPpm: Long = 975000L,
      salt: String = "boot"): DataFrame = {
    require(nResamples >= 10 && nResamples <= 10000,
      "nResamples in [10, 10000]")
    require(loPpm > 0 && hiPpm < 1000000L && loPpm < hiPpm,
      "ppm bounds must satisfy 0 < lo < hi < 1e6")
    import org.apache.spark.sql.expressions.Window
    val rows = df.select((groupCols.map(col) :+
        col(idxCol).cast("long").as("__idx") :+
        col(valueCol).cast("long").as("__v")): _*)
      .withColumn("__v",
        when(col("__v") >= 0, col("__v")).otherwise(raise_error(
          lit(s"Stats.bootstrapMeanCI: negative $valueCol — floor-div " +
            "of negative sums diverges between engines; shift or " +
            "rescale first")).cast("long")))
    val base = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(col("__idx")).as("__nd"),
        min(col("__idx")).as("__mn"), max(col("__idx")).as("__mx"),
        sum(col("__v")).as("__s"))
      .withColumn("n",
        when(col("__nd") === col("n") && col("__mn") === 0 &&
          col("__mx") === col("n") - 1, col("n"))
          .otherwise(raise_error(
            lit(s"Stats.bootstrapMeanCI: $idxCol is not a dense 0..n-1 " +
              "index — gaps or duplicates would silently bias every " +
              "draw; reindex with row_number() - 1 first").cast("string"))
            .cast("long")))
      .withColumn("obs_mean_milli", expr("(1000L * __s) div n"))
      .drop("__nd", "__mn", "__mx", "__s")
    // repartition at the session's parallelism BEFORE the ×B explode
    // (round-16 optimization, guide §2.5): the input is group-grain and
    // byte-light, so AQE's size-based coalescing packs it into one or
    // two partitions — and the ×B explode, the B·n md5 draws and the
    // pick join then SERIALIZE onto those tasks (measured: q188's 7.6 s
    // single-task stage, 17 tasks for the whole query). Repartitioning
    // the pre-explode rows by (group, idx) is a trivially small
    // exchange that hands the fan-out and the hash work the session's
    // full parallelism; the explicit count pins the exchange against
    // coalescing and is the cluster's own shuffle-partition setting,
    // not a local constant.
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val grid = nullSafeGroupJoin(rows, base, groupCols)
      .repartition(nPart, (groupCols.map(col) :+ col("__idx")): _*)
      .withColumn("__b",
        explode(typedlit((1 to nResamples).toSeq.map(_.toLong))))
    val key = concat_ws("\u0002",
      (groupCols.map(c => col(c).cast("string")) :+
        col("__b").cast("string") :+ col("__idx").cast("string")): _*)
    val draws = grid.select((groupCols.map(col) :+ col("__b") :+
      (graft.functions.PortableHash.hash60(key, salt) % col("n"))
        .as("__target")): _*)
    // equi-join on (group, idx) — NOT a group-only join filtered after,
    // which would materialize n²·B pairs per group
    val pr = groupCols.foldLeft(rows.withColumnRenamed("__idx", "__tidx"))(
      (d, c) => d.withColumnRenamed(c, s"__g_$c"))
    val pcond = (groupCols.map(c => col(c) <=> col(s"__g_$c")) :+
      (col("__tidx") === col("__target"))).reduce(_ && _)
    val picked = groupCols.foldLeft(draws.join(pr, pcond))(
      (d, c) => d.drop(s"__g_$c"))
    val means = nullSafeGroupJoin(
        picked.groupBy((groupCols.map(col) :+ col("__b")): _*)
          .agg(sum(col("__v")).as("__bs")),
        base.select((groupCols.map(col) :+ col("n")): _*), groupCols)
      .withColumn("__bm", expr("(1000L * __bs) div n"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__bm").asc, col("__b").asc)
    val loRank = (loPpm * nResamples + 999999L) / 1000000L
    val hiRank = (hiPpm * nResamples + 999999L) / 1000000L
    val ci = means.withColumn("__r", row_number().over(w))
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("__r") === math.max(1L, loRank), col("__bm")))
          .as("ci_lo_milli"),
        max(when(col("__r") === hiRank, col("__bm"))).as("ci_hi_milli"))
    nullSafeGroupJoin(base, ci, groupCols)
      .withColumn("b_resamples", lit(nResamples.toLong))
  }

  /** Deterministic two-sample permutation test for a difference in
    * group means — the exact-inference sibling of [[twoSampleZ]]
    * (no normality assumption), RNG-free: permutation b re-labels the
    * rows by ranking `hash60(salt, group ␂ b ␂ id)` (ties → id ASC)
    * and assigning the first n_A ranks to side A, so every permutation
    * is a pure function of the data that any engine replays. The
    * statistic is the floor-milli mean difference
    * `(1000·S_A) div n_A − (1000·S_B) div n_B` on non-negative long
    * values (caller-scaled; negative values RAISE — the floor-div
    * rule), and the two-sided p-value is the add-one estimate
    * `((1 + #{|diff_b| ≥ |diff_obs|}) · 1e6) div (B + 1)` — exact
    * integers end to end.
    *
    * Aggregate-grain contract like [[bootstrapMeanCI]]: the B·n
    * explode and the per-(group, b) rank window are the test's own
    * cost; feed it a series, not facts.
    */
  def permutationTest(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      labelCol: String,
      valueCol: String,
      nPerms: Int = 100,
      salt: String = "perm"): DataFrame = {
    require(nPerms >= 10 && nPerms <= 10000, "nPerms in [10, 10000]")
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .where(col(labelCol).isNotNull && col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ col(idCol).as("__id") :+
        col(labelCol).cast("boolean").as("__lab") :+
        col(valueCol).cast("long").as("__v")): _*)
      .withColumn("__v",
        when(col("__v") >= 0, col("__v")).otherwise(raise_error(
          lit(s"Stats.permutationTest: negative $valueCol — floor-div " +
            "of negative sums diverges between engines; shift first")
            .cast("string")).cast("long")))
    val base = rows.groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("__lab"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__lab"), 0L).otherwise(1L)).as("n_b"),
        sum(when(col("__lab"), col("__v")).otherwise(0L)).as("__sa"),
        sum(when(!col("__lab"), col("__v")).otherwise(0L)).as("__sb"))
      .withColumn("obs_diff_milli",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr("(1000L * __sa) div n_a - (1000L * __sb) div n_b")))
      .drop("__sa", "__sb")
    // pre-explode repartition at session parallelism — the
    // [[bootstrapMeanCI]] serialization fix (round 16, guide §2.5):
    // group-grain input coalesces small, and the ×B fan-out plus B·n
    // md5 ranks would otherwise run on one or two tasks
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val grid = nullSafeGroupJoin(rows, base, groupCols)
      .repartition(nPart, (groupCols.map(col) :+ col("__id")): _*)
      .withColumn("__b",
        explode(typedlit((1 to nPerms).toSeq.map(_.toLong))))
    val key = concat_ws("\u0002",
      (groupCols.map(c => col(c).cast("string")) :+
        col("__b").cast("string") :+ col("__id").cast("string")): _*)
    val hashed = grid.withColumn("__h",
      graft.functions.PortableHash.hash60(key, salt))
    val w = Window.partitionBy((groupCols.map(col) :+ col("__b")): _*)
      .orderBy(col("__h").asc, col("__id").asc)
    val relabeled = hashed.withColumn("__r", row_number().over(w))
      .withColumn("__pa", col("__r") <= col("n_a"))
    val perms = relabeled
      .groupBy((groupCols.map(col) :+ col("__b")): _*)
      .agg(
        sum(when(col("__pa"), col("__v")).otherwise(0L)).as("__sa"),
        sum(when(!col("__pa"), col("__v")).otherwise(0L)).as("__sb"),
        first(col("n_a")).as("__na"), first(col("n_b")).as("__nb"))
      .withColumn("__d",
        when(col("__na") > 0 && col("__nb") > 0,
          expr("(1000L * __sa) div __na - (1000L * __sb) div __nb")))
    val extreme = nullSafeGroupJoin(perms,
        base.select((groupCols.map(col) :+
          col("obs_diff_milli").as("__obs")): _*), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(when(abs(col("__d")) >= abs(col("__obs")), 1L)
        .otherwise(0L)).as("n_extreme"))
    // a group where the label never varies has no testable hypothesis:
    // obs_diff is null, every permuted diff is null, n_extreme would be
    // 0 and the add-one rule would report the SMALLEST possible p —
    // spurious maximal significance. Report null for both instead.
    nullSafeGroupJoin(base, extreme, groupCols)
      .withColumn("n_extreme",
        when(col("obs_diff_milli").isNotNull, col("n_extreme")))
      .withColumn("p_ppm",
        when(col("obs_diff_milli").isNotNull,
          expr(s"((1L + n_extreme) * 1000000L) div ${nPerms + 1}L")))
  }

  /** Changepoint by SEGMENTED LEAST SQUARES — pick, from a literal
    * candidate list, the breakpoint that minimizes the total SSE of
    * two independent linear fits (before/after): the model-based
    * changepoint detector that catches a SLOPE change where
    * [[cusumShift]]'s mean-shift screen is blind. All moments are
    * exact decimal sums; the per-segment SSE
    * `(A_yy − A_xy²/A_xx)/n` (centered, n-scaled) closes in one fixed
    * IEEE double sequence, the two segments add in a FIXED order (one
    * expression, not a float aggregation), and the argmin tie-breaks
    * to the smallest candidate — deterministic end to end.
    *
    * Degenerate segments fall back exactly: n < 2 or zero x-variance →
    * mean-only SSE (A_yy/n); an empty segment contributes 0. Output
    * per group: best breakpoint, total SSE div 1e6 (int64-ranged), and
    * both segment sizes.
    *
    * One candidate explode (fan-out |candidates|), one map-side-
    * combined 12-sum aggregation at (group, candidate) grain, one
    * argmin window over |candidates| rows per group.
    */
  def bestBreakpoint(
      df: DataFrame,
      groupCols: Seq[String],
      idxCol: String,
      valueCol: String,
      candidates: Seq[Long]): DataFrame = {
    require(candidates.nonEmpty && candidates.size <= 4096,
      "candidates: 1 to 4096 literal breakpoints")
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .where(col(idxCol).isNotNull && col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ col(idxCol).cast("long").as("__x") :+
        col(valueCol).cast("long").as("__y")): _*)
      .withColumn("b", explode(typedlit(candidates.sorted)))
      .withColumn("__seg", (col("__x") >= col("b")).cast("int"))
    val xd = col("__x").cast("decimal(38,0)")
    val yd = col("__y").cast("decimal(38,0)")
    def segSum(seg: Int, e: org.apache.spark.sql.Column) =
      sum(when(col("__seg") === seg, e).otherwise(lit(0).cast(
        "decimal(38,0)")))
    def moments(seg: Int) = Seq(
      sum(when(col("__seg") === seg, 1L).otherwise(0L)).as(s"__n$seg"),
      segSum(seg, xd).as(s"__sx$seg"), segSum(seg, yd).as(s"__sy$seg"),
      segSum(seg, xd * xd).as(s"__sxx$seg"),
      segSum(seg, xd * yd).as(s"__sxy$seg"),
      segSum(seg, yd * yd).as(s"__syy$seg"))
    val agged = rows.groupBy((groupCols.map(col) :+ col("b")): _*)
      .agg(moments(0).head, (moments(0).tail ++ moments(1)): _*)
    def sse(seg: Int) = {
      val n = col(s"__n$seg").cast("double")
      val sx = col(s"__sx$seg").cast("double")
      val sy = col(s"__sy$seg").cast("double")
      val sxx = col(s"__sxx$seg").cast("double")
      val sxy = col(s"__sxy$seg").cast("double")
      val syy = col(s"__syy$seg").cast("double")
      val axx = n * sxx - sx * sx
      val axy = n * sxy - sx * sy
      val ayy = n * syy - sy * sy
      when(col(s"__n$seg") === 0, lit(0.0))
        .when(col(s"__n$seg") >= 2 && axx > 0.0, (ayy - axy * axy / axx) / n)
        .otherwise(ayy / n)
    }
    val scored = agged.withColumn("__sse", sse(0) + sse(1))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__sse").asc, col("b").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select((groupCols.map(col) :+ col("b").as("best_break") :+
        floor(col("__sse") / lit(1000000.0)).cast("long")
          .as("sse_div1e6") :+
        col("__n0").as("n_before") :+ col("__n1").as("n_after")): _*)
  }

  /** Wilson score LOWER BOUND for a binomial proportion — the
    * rank-by-confidence column every "best rated / most returned /
    * highest CTR" list should sort by instead of the raw ratio (a 1/1
    * item must not outrank 95/100; Wilson's lower bound encodes
    * exactly that). One fixed IEEE double sequence from integer
    * (successes, trials) — deterministic and engine-replayable when
    * the replay writes the SAME expression shape:
    * `(p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)`.
    * Null when trials = 0.
    */
  def wilsonLowerBound(
      successes: org.apache.spark.sql.Column,
      trials: org.apache.spark.sql.Column,
      z: Double = 1.96): org.apache.spark.sql.Column = {
    val n = trials.cast("double")
    val p = successes.cast("double") / n
    val z2 = z * z
    when(trials > 0,
      (p + lit(z2) / (lit(2.0) * n) -
        lit(z) * sqrt((p * (lit(1.0) - p) + lit(z2) / (lit(4.0) * n)) / n))
        / (lit(1.0) + lit(z2) / n))
  }

  /** Theil–Sen robust slope — the MEDIAN of all pairwise slopes
    * (y_j − y_i)/(x_j − x_i) over an aggregate-grain series: immune to
    * ~29% outliers where [[regression]]'s OLS slope is not, the robust
    * trend line for noisy daily metrics. O(n²) pairs BY DEFINITION, so
    * the [[kendallTau]] maxRows contract (filter-guard RAISE) applies;
    * pairs require distinct x (equal-x pairs carry no slope and drop).
    *
    * Exactness: each slope is floor-e6 of a double division of exact
    * integers (the signed double-floor rule — integer div would
    * truncate toward zero where DuckDB floors); the median is the
    * LOWER nearest-rank member under the total order (slope, x_a, x_b)
    * — an actual pair's slope, not an interpolated blend.
    */
  def theilSen(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      maxRows: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((groupCols.map(col) :+ col(xCol).cast("long").as("__x") :+
        col(yCol).cast("long").as("__y")): _*)
      .withColumn("__gn",
        count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
      .where(when(col("__gn") <= maxRows, lit(true))
        .otherwise(raise_error(concat(
          lit(s"Stats.theilSen: a group has "), col("__gn").cast("string"),
          lit(s" rows > maxRows=$maxRows — the O(n²) pair scan needs " +
            "aggregate-grain input; pre-aggregate or raise maxRows"))
          .cast("boolean"))))
      .drop("__gn")
    val b = groupCols.foldLeft(
        rows.select((groupCols.map(col) :+ col("__x").as("__xb") :+
          col("__y").as("__yb")): _*))(
        (d, c) => d.withColumnRenamed(c, s"__g_$c"))
    val cond = (groupCols.map(c => col(c) <=> col(s"__g_$c")) :+
      (col("__x") < col("__xb"))).reduce(_ && _)
    val pairs = groupCols.foldLeft(rows.join(b, cond))(
        (d, c) => d.drop(s"__g_$c"))
      .withColumn("__s",
        floor((col("__yb") - col("__y")).cast("double") * 1e6 /
          (col("__xb") - col("__x")).cast("double")).cast("long"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__s").asc, col("__x").asc, col("__xb").asc)
    val ranked = pairs.withColumn("__r", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val med = ranked
      .where(col("__r") === expr("(__m + 1L) div 2"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__m")).as("n_pairs"), max(col("__s")).as("slope_e6"))
    val ns = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    nullSafeGroupJoin(ns, med, groupCols)
  }

  /** Sample autocorrelation function (ACF) at lags 1..maxLag over an
    * integer-indexed, integer-valued series — the seasonality /
    * persistence diagnostic a forecasting pipeline runs first.
    *
    * Exactness: with mean x̄ = S/n rational, multiplying the centered
    * numerator Σ(x_t−x̄)(x_{t+k}−x̄) and denominator Σ(x_t−x̄)² by n²
    * turns every term into (n·x_t − S)(n·x_{t+k} − S) — exact
    * integers, accumulated as decimal(38,0) (|n·x−S| ≤ 2nX bounds the
    * sum by 4n³X², within decimal(38) for day-grain cents). The ratio
    * closes in doubles, floor-e6. Pairing is strict index equality
    * `idx_b = idx_a + lag` — the caller controls gap semantics via the
    * index it supplies (dense row_number = positional ACF, calendar
    * day = gap-aware).
    *
    * 100 TB posture: input is aggregate-grain (a series, not facts);
    * one literal lag explode (fan-out maxLag), one self-equi-join on
    * (group, idx), one map-side-combined aggregation; the per-group
    * (n, S) table joins back broadcast-sized.
    */
  def acf(
      df: DataFrame,
      groupCols: Seq[String],
      idxCol: String,
      valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, "maxLag in [1, 64]")
    val rows = df.where(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ col(idxCol).cast("long").as("__idx") :+
        col(valueCol).cast("long").as("__v")): _*)
    val tot = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__v")).cast("decimal(38,0)").as("__s"))
    val centered = nullSafeGroupJoin(rows, tot, groupCols)
      .withColumn("__c",
        col("__n") * col("__v").cast("decimal(38,0)") - col("__s"))
    val den = centered.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__c") * col("__c")).as("__den"),
        first(col("__n")).cast("long").as("n"))
    val lagged = centered
      .withColumn("lag", explode(typedlit((1 to maxLag).toSeq.map(_.toLong))))
    val right = groupCols.foldLeft(
        centered.select((groupCols.map(col) :+ col("__idx").as("__idxb") :+
          col("__c").as("__cb")): _*))(
        (d, c) => d.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val pairs = lagged.join(right,
      cond && col("__idxb") === col("__idx") + col("lag"))
    val nums = pairs.groupBy((groupCols.map(col) :+ col("lag")): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__c") * col("__cb")).as("__num"))
    nullSafeGroupJoin(nums, den, groupCols)
      .withColumn("acf_e6",
        when(col("__den") > 0,
          floor(col("__num").cast("double") / col("__den").cast("double")
            * 1e6).cast("long")))
      .drop("__num", "__den")
  }
}
