package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate (the pre-ingest contract check a
  * training pipeline runs before admitting a batch): a list of typed
  * constraints evaluated into one uniform report —
  * `(check_name, violations, total, viol_ppm, passed)` — that a
  * release job can assert on or publish.
  *
  * 100 TB design notes — scans, not checks, are the unit of cost:
  *  - ALL row-local checks ([[Quality.NotNull]], [[Quality.InRange]],
  *    [[Quality.InSet]]) fold into ONE aggregate over ONE scan: each
  *    contributes a conditional-sum column, the single result row is
  *    exploded back into report rows. k row-local checks cost exactly
  *    one pass regardless of k (the naive one-query-per-check form
  *    scans k times; Expand-based forms ship k× the rows through the
  *    aggregation).
  *  - [[Quality.Unique]] needs key grouping (one map-side-combined
  *    shuffle of the key columns only); [[Quality.RefIntegrity]] needs
  *    one join against the DISTINCT dimension keys (a left join with a
  *    null-probe conditional sum — AQE broadcasts the collapsed dim
  *    side when it fits). Each adds exactly one extra pass, and the
  *    report says so by construction.
  *  - Every metric is integer (counts and floor-ppm); `passed` is the
  *    integer cross-multiplication `violations·10⁶ ≤ maxPpm·total`,
  *    so thresholds behave identically on any engine. An empty table
  *    passes every check (0 ≤ 0).
  */
object Quality {

  sealed trait Check { def name: String; def maxPpm: Long }

  /** `column` must be non-null in all but `maxPpm` parts-per-million
    * of rows. */
  final case class NotNull(column: String, maxPpm: Long = 0L) extends Check {
    def name = s"not_null($column)"
  }

  /** Non-null values of `column` must lie in `[lo, hi]`. Nulls are
    * [[NotNull]]'s business, not a range violation. */
  final case class InRange(column: String, lo: Double, hi: Double,
      maxPpm: Long = 0L) extends Check {
    def name = s"in_range($column)"
  }

  /** Non-null values of `column` (as strings) must be in `allowed`. */
  final case class InSet(column: String, allowed: Seq[String],
      maxPpm: Long = 0L) extends Check {
    def name = s"in_set($column)"
  }

  /** The column tuple must be unique; violations = rows beyond the
    * first of each duplicated tuple (null-safe grouping). */
  final case class Unique(columns: Seq[String], maxPpm: Long = 0L)
      extends Check {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Non-null values of `column` must exist in `dim.dimColumn`;
    * violations = orphan rows. */
  final case class RefIntegrity(column: String, dim: DataFrame,
      dimColumn: String, maxPpm: Long = 0L) extends Check {
    def name = s"ref($column)"
  }

  /** Per-row violation indicator (0/1) for a ROW-LOCAL check — ONE
    * definition shared by the batch report ([[run]]) and the streaming
    * window report ([[graft.streaming.StreamOps.qualityWindows]]), so
    * batch and stream verdicts cannot drift. Grouping checks
    * ([[Unique]], [[RefIntegrity]]) have no per-row form and throw.
    */
  private[graft] def rowViolation(c: Check): Column = c match {
    case c: NotNull => when(col(c.column).isNull, 1L).otherwise(0L)
    case c: InRange => when(col(c.column).isNotNull &&
      (col(c.column) < c.lo || col(c.column) > c.hi), 1L).otherwise(0L)
    case c: InSet => when(col(c.column).isNotNull &&
      !col(c.column).cast("string").isin(c.allowed: _*), 1L).otherwise(0L)
    case other => throw new IllegalArgumentException(
      s"${other.name} is not row-local")
  }

  /** Evaluate `checks` against `df`; one report row per check, in the
    * caller's check order (the report carries the check index and is
    * sorted on it — report grain is k rows, so the sort is free).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val indexed = checks.zipWithIndex

    val rowLocal = indexed.collect {
      case (c, ord) if c.isInstanceOf[NotNull] || c.isInstanceOf[InRange] ||
          c.isInstanceOf[InSet] =>
        (c, ord, c.maxPpm, sum(rowViolation(c)))
    }

    // one scan, one aggregate row, exploded into one row per check
    val scanReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.zipWithIndex.map { case ((_, _, _, agg), i) =>
          coalesce(agg, lit(0L)).as(s"__v$i")
        }
        val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
        val packed = rowLocal.zipWithIndex.map { case ((c, ord, maxPpm, _), i) =>
          struct(lit(ord).as("ord"), lit(c.name).as("check_name"),
            col(s"__v$i").as("violations"), lit(maxPpm).as("max_ppm"))
        }
        Some(one.select(col("__total"), explode(array(packed: _*)).as("c"))
          .select(col("c.ord"), col("c.check_name"), col("c.violations"),
            col("__total").as("total"), col("c.max_ppm")))
      }

    val uniqueReports = indexed.collect { case (c: Unique, ord) =>
      df.groupBy(c.columns.map(col): _*)
        .agg(count(lit(1)).as("__cnt"))
        .agg(coalesce(sum(col("__cnt") - 1L), lit(0L)).as("violations"),
          coalesce(sum(col("__cnt")), lit(0L)).as("total"))
        .select(lit(ord).as("ord"), lit(c.name).as("check_name"),
          col("violations"), col("total"), lit(c.maxPpm).as("max_ppm"))
    }

    val refReports = indexed.collect { case (c: RefIntegrity, ord) =>
      val dimKeys = c.dim.select(col(c.dimColumn).as("__dim_key")).distinct()
      df.select(col(c.column).as("__fk")).where(col("__fk").isNotNull)
        .join(dimKeys, col("__fk") === col("__dim_key"), "left")
        .agg(coalesce(sum(when(col("__dim_key").isNull, 1L).otherwise(0L)),
          lit(0L)).as("violations"),
          count(lit(1)).as("total"))
        .select(lit(ord).as("ord"), lit(c.name).as("check_name"),
          col("violations"), col("total"), lit(c.maxPpm).as("max_ppm"))
    }

    val parts = scanReport.toSeq ++ uniqueReports ++ refReports
    parts.reduce(_ unionByName _)
      .orderBy(col("ord"))
      .select(col("check_name"), col("violations"), col("total"),
        when(col("total") === 0L, 0L)
          .otherwise(expr("(violations * 1000000) div total")).as("viol_ppm"),
        (col("violations") * 1000000L <= col("max_ppm") * col("total"))
          .as("passed"))
  }

  /** Benford's-law first-digit screen — the classic fabricated-numbers
    * / broken-ETL smell test over an amount column. One row per digit
    * 1–9: `(digit, n, observed_ppm, benford_ppm, delta_ppm)`, all nine
    * digits always present. Values enter as `floor(value)` and rows
    * below 1 are ignored (Benford applies to positive magnitudes); the
    * first digit comes from the BIGINT's decimal rendering, which is
    * engine-identical (no float log10, whose rounding at exact powers
    * of ten would split engines). The expected shares are the
    * floor-ppm constants of log10(1 + 1/d), baked in as literals.
    *
    * One map-side-combined aggregation to digit grain (9 groups);
    * everything after runs on the 9-row table.
    */
  def benfordScreen(df: DataFrame, valueCol: String): DataFrame = {
    val benfordPpm =
      Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L,
        51152L, 45757L)
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .withColumn("benford_ppm",
        element_at(array(benfordPpm.map(lit): _*), col("digit")))
    val counts = df
      .select(floor(col(valueCol)).cast("long").as("__q_v"))
      .where(col("__q_v") >= 1L)
      .select(substring(col("__q_v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(coalesce(sum(col("n")), lit(0L)).as("__q_total"))
    digits.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .withColumn("observed_ppm",
        when(col("__q_total") === 0L, 0L)
          .otherwise(expr("(n * 1000000) div __q_total")))
      .select(col("digit"), col("n"), col("observed_ppm"),
        col("benford_ppm"),
        (col("observed_ppm") - col("benford_ppm")).as("delta_ppm"))
  }

  /** Deterministic pseudonymization — replace identifier columns with
    * salted-hash surrogates so datasets can leave the trust boundary
    * with REFERENTIAL INTEGRITY intact: the same (salt, value) maps to
    * the same pseudonym in every table, so joins still work, while the
    * original keys never appear. Built on [[graft.functions
    * .PortableHash.hash60]] (the repo's one salted-hash recipe) so
    * oracles replay it bit-for-bit; 60 bits keeps collision odds
    * below ~1e-9 per billion distinct keys (birthday bound) — for
    * hard guarantees join a dictionary instead.
    *
    * A pure narrow projection: no shuffle, no state, safe to run
    * per-partition at any scale. NULL stays NULL (a pseudonym for
    * null would fabricate a join key).
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNotNull,
        graft.functions.PortableHash.hash60(col(c), salt)))
    }

  /** ZERO-COST observed quality metrics — Spark's native
    * `Dataset.observe` (CollectMetrics): the same violation counters
    * [[run]] computes, attached to an EXISTING job instead of a second
    * scan. The production shape for "count violations while writing
    * the output anyway": metrics ride the write job's pass over the
    * data and surface through the Observation handle / query-listener
    * events, so a 100 TB write pays nothing extra for its quality
    * readout. Returns the instrumented frame and the handle;
    * `observation.get` blocks until an ACTION on the frame completes.
    */
  def observed(
      df: DataFrame,
      checks: Seq[Check]): (DataFrame, org.apache.spark.sql.Observation) = {
    require(checks.nonEmpty, "need at least one check")
    val obs = org.apache.spark.sql.Observation()
    // rowViolation is already a 0/1 integer expression
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map(c => sum(rowViolation(c).cast("long")).as(c.name))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Ingest ARRIVAL-health report — the diagnostics a streaming
    * pipeline's batch-side audit runs to size watermarks and dedup
    * state before turning them on: per key (event type), duplicate-id
    * counts and event-time REGRESSIONS against the same entity's
    * earlier arrivals. Arrival order is `arrivalCol` (monotone ingest
    * ids or offsets — the caller names the log's order); an event is
    * out-of-order when its event time is strictly below the running
    * max of everything the entity already delivered. Exact integer
    * counts + floor-ppm rate.
    *
    * 100 TB shape: one entity-partitioned window (running max), one
    * map-side-combined aggregation; count-distinct of ids is the only
    * potentially wide state and stays key-grain.
    */
  def arrivalHealth(
      events: DataFrame,
      keyCol: String,
      entityCol: String,
      idCol: String,
      tsCol: String,
      arrivalCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol)).orderBy(col(arrivalCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__prevmax", max(col(tsCol)).over(w))
      .withColumn("__ooo",
        col("__prevmax").isNotNull && col(tsCol) < col("__prevmax"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col(idCol))).as("n_dup_ids"),
        sum(when(col("__ooo"), 1L).otherwise(0L)).as("n_ooo"))
      .withColumn("ooo_ppm", expr("n_ooo * 1000000L div n"))
  }
}
