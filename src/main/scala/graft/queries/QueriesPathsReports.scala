package graft

import graft.functions.{Distances, TextFunctions}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query+oracle registrations: one family slice of the [[Queries]]
  * surface (split from the former monolithic Queries.scala; the
  * registry maps stay in [[Queries]]).
  */
private[graft] trait QueriesPathsReports { this: Queries.type =>
  /** q217: event-path CONFORMANCE — each user's first-10-step
    * type-initial path scored by Levenshtein distance against the
    * canonical "svcp" journey (signup → view → click → purchase), the
    * sequence-QA screen behind onboarding funnels; reported as a
    * distance histogram. Path assembly is the deterministic
    * sort_array-of-structs fold (collect_list alone is
    * partition-order-dependent); Levenshtein is the same textbook
    * recurrence in both engines (the q150 parity precedent).
    */
  def pathConformance(s: SparkSession, dir: String): DataFrame = {
    val paths = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ini"))
      .groupBy(col("user_id"))
      .agg(array_join(expr(
        "transform(slice(array_sort(collect_list(" +
          "struct(ts, event_id, ini))), 1, 10), x -> x.ini)"), "")
        .as("path"))
    paths.select(levenshtein(col("path"), lit("svcp")).as("distance"))
      .groupBy(col("distance")).agg(count(lit(1)).as("n_users"))
      .orderBy("distance")
  }

  val pathConformanceSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id,
      |    substr(event_type, 1, 1) AS ini FROM events),
      |rk AS (SELECT user_id, ini,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY tns, event_id) AS rn
      |  FROM e),
      |p AS (SELECT user_id,
      |    string_agg(ini, '' ORDER BY rn) AS path
      |  FROM rk WHERE rn <= 10 GROUP BY user_id)
      |SELECT CAST(levenshtein(path, 'svcp') AS INT) AS distance,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  /** q218: embedding covariance diagnostics — the top-20 most
    * co-varying dimension pairs of the e6-QUANTIZED embedding space
    * (n-scaled covariance n·Σxy − Σx·Σy in exact integers): redundant
    * or entangled dimensions jump out, the cheap pre-PCA screen. One
    * component self-join at (vec, i ≤ j) grain — fan-out dim²/2,
    * bounded by geometry, never by corpus.
    */
  def embedCovariance(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1000000.0)).cast("long")))
          .as(Seq("pos", "qv")))
    val b = q.select(col("vec_id").as("__vid"), col("pos").as("pos_j"),
      col("qv").as("qj"))
    val pairs = q.join(b,
      col("__vid") === col("vec_id") && col("pos_j") > col("pos"))
    pairs.groupBy(col("pos").as("pos_i"), col("pos_j"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("qv")).cast("decimal(38,0)").as("__sx"),
        sum(col("qj")).cast("decimal(38,0)").as("__sy"),
        sum(col("qv") * col("qj")).cast("decimal(38,0)").as("__sxy"))
      .withColumn("cov_n",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("decimal(38,0)"))
      .select(col("pos_i"), col("pos_j"), col("cov_n").cast("long")
        .as("cov_n"))
      .orderBy(abs(col("cov_n")).desc, col("pos_i").asc, col("pos_j").asc)
      .limit(20)
  }

  val embedCovarianceSql: String =
    """WITH q AS (SELECT vec_id, i.i AS pos,
      |    CAST(FLOOR(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000.0)
      |      AS BIGINT) AS qv
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
      |p AS (SELECT a.pos AS pos_i, b.pos AS pos_j,
      |    CAST(COUNT(*) AS HUGEINT) AS n,
      |    CAST(SUM(CAST(a.qv AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(SUM(CAST(b.qv AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(SUM(CAST(a.qv AS HUGEINT) * b.qv) AS HUGEINT) AS sxy
      |  FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.pos > a.pos
      |  GROUP BY 1, 2)
      |SELECT pos_i, pos_j,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS cov_n
      |FROM p
      |ORDER BY abs(n * sxy - sx * sy) DESC, pos_i ASC, pos_j ASC
      |LIMIT 20""".stripMargin

  /** q219: SPLIT-CONFORMAL calibration — distribution-free prediction
    * intervals for the q72 price~quantity regression: fit on the train
    * split, take q̂ = the ⌈0.9·(n+1)⌉-th smallest absolute residual on
    * the CALIBRATION split (nearest-rank — an actual residual, the
    * no-interpolation rule), report the guaranteed-coverage check on
    * the TEST split. Residuals are floor-milli integers from the
    * deterministic double fit, so ranks and coverage counts are exact.
    */
  def conformalCalibration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem").select(
      (col("l_orderkey") % 4).as("split"),
      floor(col("l_quantity")).cast("long").as("x"),
      floor(col("l_extendedprice") * 1000).cast("long").as("y_milli"))
    val m = li.where(col("split") < 2)
      .agg(count(lit(1)).as("n_train"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y_milli").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x").cast("decimal(38,0)") *
          col("y_milli").cast("decimal(38,0)"))).as("sxy"))
      .withColumn("slope",
        (col("n_train").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n_train").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("icept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n_train").cast("double"))
      .select(col("n_train"), col("slope"), col("icept"))
    val scored = li.where(col("split") >= 2).crossJoin(broadcast(m))
      .withColumn("__res",
        abs(col("y_milli") - floor(col("slope") * col("x").cast("double")
          + col("icept")).cast("long")))
    val cal = scored.where(col("split") === 2)
    // calibration-split grain: the conformal rank runs over the CAL
    // slice only (a fixed fraction of the fit fixture, report-sized)
    val w = Window.orderBy(col("__res").asc, col("x").asc,
      col("y_milli").asc)
    val qhat = cal.withColumn("__r", row_number().over(w))
      .withColumn("__nc", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .where(col("__r") === expr("least(__nc, ((__nc + 1) * 9) div 10)"))
      .groupBy()
      .agg(max(col("__nc")).as("n_cal"), max(col("__res")).as("qhat_milli"))
    scored.where(col("split") === 3).crossJoin(broadcast(qhat))
      .agg(first(col("n_train")).as("n_train"),
        first(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        first(col("qhat_milli")).as("qhat_milli"),
        sum(when(col("__res") <= col("qhat_milli"), 1L).otherwise(0L))
          .as("__cov"))
      .withColumn("coverage_ppm", expr("__cov * 1000000L div n_test"))
      .drop("__cov")
  }

  val conformalCalibrationSql: String =
    """WITH li AS (SELECT l_orderkey % 4 AS split,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS x,
      |    CAST(FLOOR(l_extendedprice * 1000) AS BIGINT) AS y_milli
      |  FROM lineitem),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
      |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y_milli AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(x AS HUGEINT) * y_milli) AS DOUBLE) AS sxy
      |  FROM li WHERE split < 2),
      |f AS (SELECT n_train,
      |    (CAST(n_train AS DOUBLE) * sxy - sx * sy)
      |      / (CAST(n_train AS DOUBLE) * sxx - sx * sx) AS slope
      |  FROM m),
      |f2 AS (SELECT f.n_train, f.slope,
      |    (m.sy - f.slope * m.sx) / CAST(f.n_train AS DOUBLE) AS icept
      |  FROM f CROSS JOIN m),
      |sc AS (SELECT li.split, li.x, li.y_milli,
      |    abs(li.y_milli - CAST(FLOOR(f2.slope * CAST(li.x AS DOUBLE)
      |      + f2.icept) AS BIGINT)) AS res,
      |    f2.n_train
      |  FROM li CROSS JOIN f2 WHERE li.split >= 2),
      |cal AS (SELECT res, n_train,
      |    ROW_NUMBER() OVER (ORDER BY res ASC, x ASC, y_milli ASC) AS r,
      |    COUNT(*) OVER () AS nc
      |  FROM sc WHERE split = 2),
      |qh AS (SELECT CAST(nc AS BIGINT) AS n_cal,
      |    CAST(res AS BIGINT) AS qhat_milli
      |  FROM cal WHERE r = LEAST(nc, ((nc + 1) * 9) // 10))
      |SELECT MAX(sc.n_train) AS n_train, MAX(qh.n_cal) AS n_cal,
      |  CAST(COUNT(*) AS BIGINT) AS n_test,
      |  MAX(qh.qhat_milli) AS qhat_milli,
      |  CAST(SUM(CASE WHEN sc.res <= qh.qhat_milli THEN 1 ELSE 0 END)
      |    * 1000000 // COUNT(*) AS BIGINT) AS coverage_ppm
      |FROM sc CROSS JOIN qh WHERE sc.split = 3""".stripMargin

  /** q220: retention DECAY fit — weekly retention curve r_k (distinct
    * users active k weeks after their first week, over the user base),
    * fitted as ln(r_k_ppm) ~ k by the exact-moment recipe: the ln
    * terms floor-e6-quantize BEFORE the regression (the q158 rule), so
    * the decimal sums and the closing slope/half-life doubles are
    * engine-identical. half_life_milli = −ln(2)/slope·1000, the weeks
    * for retention to halve.
    */
  def retentionDecayFit(s: SparkSession, dir: String): DataFrame = {
    val weeks = t(s, dir, "events")
      .select(col("user_id"), expr("ts div 604800000000000").as("wk"))
      .distinct()
    val first = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("w0"))
    val ages = weeks.join(first, Seq("user_id"))
      .select(col("user_id"), (col("wk") - col("w0")).as("k"))
      .distinct()
    val base = first.agg(countDistinct(col("user_id")).as("nu"))
    val curve = ages.groupBy(col("k"))
      .agg(countDistinct(col("user_id")).as("active"))
      .crossJoin(broadcast(base))
      .withColumn("r_ppm", expr("active * 1000000L div nu"))
      .where(col("r_ppm") > 0)
      .withColumn("lnr_e6",
        floor(log(col("r_ppm").cast("double")) * 1e6).cast("long"))
    val mom = curve.agg(count(lit(1)).as("n_points"),
        sum(col("k").cast("decimal(38,0)")).as("sx"),
        sum(col("lnr_e6").cast("decimal(38,0)")).as("sy"),
        sum((col("k") * col("k")).cast("decimal(38,0)")).as("sxx"),
        sum((col("k").cast("decimal(38,0)") *
          col("lnr_e6").cast("decimal(38,0)"))).as("sxy"))
    mom.withColumn("__sl",
        (col("n_points").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n_points").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("slope_e6_per_wk", floor(col("__sl")).cast("long"))
      .withColumn("half_life_milli_wk",
        when(col("__sl") < 0,
          floor(lit(-1000000.0 * math.log(2.0)) / col("__sl") * 1000.0)
            .cast("long")))
      .select(col("n_points"), col("slope_e6_per_wk"),
        col("half_life_milli_wk"))
  }

  val retentionDecayFitSql: String =
    """WITH wk AS (SELECT DISTINCT user_id,
      |    epoch_ns(ts) // 604800000000000 AS wk FROM events),
      |f AS (SELECT user_id, MIN(wk) AS w0 FROM wk GROUP BY user_id),
      |ages AS (SELECT DISTINCT wk.user_id, wk.wk - f.w0 AS k
      |  FROM wk JOIN f ON f.user_id = wk.user_id),
      |base AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu
      |  FROM f),
      |curve AS (SELECT k,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active FROM ages
      |  GROUP BY k),
      |c2 AS (SELECT k, active * 1000000 // base.nu AS r_ppm
      |  FROM curve CROSS JOIN base),
      |c3 AS (SELECT k,
      |    CAST(FLOOR(ln(CAST(r_ppm AS DOUBLE)) * 1e6) AS BIGINT)
      |      AS lnr_e6
      |  FROM c2 WHERE r_ppm > 0),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
      |    CAST(SUM(CAST(k AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(lnr_e6 AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(k AS HUGEINT) * k) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(k AS HUGEINT) * lnr_e6) AS DOUBLE) AS sxy
      |  FROM c3),
      |sl AS (SELECT n_points,
      |    (CAST(n_points AS DOUBLE) * sxy - sx * sy)
      |      / (CAST(n_points AS DOUBLE) * sxx - sx * sx) AS s
      |  FROM m)
      |SELECT n_points, CAST(FLOOR(s) AS BIGINT) AS slope_e6_per_wk,
      |  CASE WHEN s < 0 THEN
      |    CAST(FLOOR(-1000000.0 * ln(2.0) / s * 1000.0) AS BIGINT) END
      |    AS half_life_milli_wk
      |FROM sl""".stripMargin

  /** q221: Benjamini–Hochberg FDR over the per-priority weekend
    * permutation tests — the multiple-testing correction a metrics
    * platform must apply before flagging segments: m = 5 exact
    * permutation p-values (q189's machinery, grouped), BH rule
    * rejected(i) ⟺ p_(i)·m ≤ i·α as PURE INTEGER cross-multiplication
    * on ppm values (α = 10%), with the standard step-up closure
    * (everything below the largest passing rank rejects).
    */
  def fdrWeekendByPriority(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
      .withColumn("weekend", dayofweek(col("day")).isin(1, 7))
    val tests = Stats.permutationTest(daily, Seq("o_orderpriority"),
      "day", "weekend", "rev", nPerms = 100)
      // untestable strata (label never varies → null p) cannot enter a
      // multiple-testing correction; drop them before ranking
      .where(col("p_ppm").isNotNull)
    // strata-grain global window: one row per tested stratum (the BH
    // correction is a total order over the k hypotheses by definition)
    val w = Window.orderBy(col("p_ppm").asc, col("o_orderpriority").asc)
    val ranked = tests
      .withColumn("rank", row_number().over(w))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("__pass",
        col("p_ppm") * col("m") <= col("rank") * lit(100000L))
    val cutoff = ranked.agg(
      coalesce(max(when(col("__pass"), col("rank"))), lit(0L)).as("__k"))
    ranked.crossJoin(broadcast(cutoff))
      .select(col("o_orderpriority"), col("p_ppm"), col("rank"),
        (col("rank") <= col("__k")).as("rejected"))
      .orderBy("rank")
  }

  val fdrWeekendByPrioritySql: String = {
    val key = "concat_ws(chr(2), g, CAST(b AS VARCHAR), CAST(day AS VARCHAR))"
    s"""WITH daily AS (SELECT o_orderpriority AS g,
       |    CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS rev
       |  FROM orders GROUP BY 1, 2),
       |lab AS (SELECT g, day, rev, dayofweek(day) IN (0, 6) AS we
       |  FROM daily),
       |base AS (SELECT g,
       |    CAST(SUM(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(SUM(CASE WHEN we THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN we THEN rev ELSE 0 END) AS BIGINT) AS sa,
       |    CAST(SUM(CASE WHEN we THEN 0 ELSE rev END) AS BIGINT) AS sb
       |  FROM lab GROUP BY g),
       |grid AS (SELECT l.g, l.day, l.rev, b.b FROM lab l
       |  CROSS JOIN (SELECT unnest(range(1, 101)) AS b) b),
       |h AS (SELECT g, day, rev, b, ${duckHash60("perm", key)} AS hv
       |  FROM grid),
       |rk AS (SELECT g, b, day, rev,
       |    ROW_NUMBER() OVER (PARTITION BY g, b
       |      ORDER BY hv ASC, day ASC) AS r
       |  FROM h),
       |perms AS (SELECT rk.g, rk.b,
       |    CAST((1000 * SUM(CASE WHEN rk.r <= base.n_a THEN rk.rev
       |        ELSE 0 END)) // MAX(base.n_a) AS BIGINT)
       |    - CAST((1000 * SUM(CASE WHEN rk.r > base.n_a THEN rk.rev
       |        ELSE 0 END)) // MAX(base.n_b) AS BIGINT) AS d
       |  FROM rk JOIN base ON base.g = rk.g GROUP BY rk.g, rk.b),
       |obs AS (SELECT g, CAST((1000 * sa) // n_a AS BIGINT)
       |    - CAST((1000 * sb) // n_b AS BIGINT) AS od FROM base),
       |ext AS (SELECT perms.g, CAST(COUNT(*) AS BIGINT) AS n_extreme
       |  FROM perms JOIN obs ON obs.g = perms.g
       |  WHERE abs(perms.d) >= abs(obs.od) GROUP BY perms.g),
       |pv AS (SELECT obs.g,
       |    CASE WHEN obs.od IS NOT NULL THEN
       |      CAST(((1 + COALESCE(ext.n_extreme, 0)) * 1000000) // 101
       |        AS BIGINT) END AS p_ppm
       |  FROM obs LEFT JOIN ext ON ext.g = obs.g),
       |rkd AS (SELECT g, p_ppm,
       |    ROW_NUMBER() OVER (ORDER BY p_ppm ASC, g ASC) AS rank,
       |    COUNT(*) OVER () AS m
       |  FROM pv WHERE p_ppm IS NOT NULL),
       |k AS (SELECT COALESCE(MAX(CASE WHEN p_ppm * m <= rank * 100000
       |    THEN rank END), 0) AS kk FROM rkd)
       |SELECT rkd.g AS o_orderpriority, rkd.p_ppm,
       |  CAST(rkd.rank AS BIGINT) AS rank, rkd.rank <= k.kk AS rejected
       |FROM rkd CROSS JOIN k ORDER BY rkd.rank""".stripMargin
  }

  /** q222: Simpson's-paradox guard — the aggregate weekend-vs-weekday
    * revenue effect next to every stratum's own effect (priority
    * strata): when the pooled sign contradicts every stratum's sign,
    * the pooled number is a composition artifact and the report SAYS
    * so. Signs of exact floor-milli mean differences, one boolean
    * verdict row per stratum plus the pooled row.
    */
  def simpsonGuard(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
      .withColumn("we", dayofweek(col("day")).isin(1, 7))
    def diff(df: DataFrame, g: Seq[String]) = df
      .groupBy(g.map(col): _*)
      .agg(sum(when(col("we"), col("rev")).otherwise(0L)).as("__sa"),
        sum(when(col("we"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("we"), col("rev")).otherwise(0L)).as("__sb"),
        sum(when(!col("we"), 1L).otherwise(0L)).as("__nb"))
      .withColumn("diff_milli",
        when(col("__na") > 0 && col("__nb") > 0,
          expr("(1000L * __sa) div __na - (1000L * __sb) div __nb")))
      .drop("__sa", "__na", "__sb", "__nb")
    val strata = diff(daily, Seq("o_orderpriority"))
      .select(col("o_orderpriority").as("stratum"), col("diff_milli"))
    val pooled = diff(daily, Seq.empty)
      .select(lit("(pooled)").as("stratum"), col("diff_milli"))
    val pooledSign = pooled.select(signum(col("diff_milli")).as("__ps"))
    strata.unionByName(pooled)
      .crossJoin(broadcast(pooledSign))
      .withColumn("agrees_with_pooled",
        signum(col("diff_milli")) === col("__ps"))
      .drop("__ps")
      .orderBy("stratum")
  }

  val simpsonGuardSql: String =
    """WITH daily AS (SELECT o_orderpriority AS g,
      |    CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM orders GROUP BY 1, 2),
      |lab AS (SELECT g, rev, dayofweek(day) IN (0, 6) AS we FROM daily),
      |st AS (SELECT g AS stratum,
      |    CAST((1000 * SUM(CASE WHEN we THEN rev ELSE 0 END))
      |      // SUM(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT)
      |    - CAST((1000 * SUM(CASE WHEN we THEN 0 ELSE rev END))
      |      // SUM(CASE WHEN we THEN 0 ELSE 1 END) AS BIGINT)
      |      AS diff_milli
      |  FROM lab GROUP BY g),
      |pl AS (SELECT '(pooled)' AS stratum,
      |    CAST((1000 * SUM(CASE WHEN we THEN rev ELSE 0 END))
      |      // SUM(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT)
      |    - CAST((1000 * SUM(CASE WHEN we THEN 0 ELSE rev END))
      |      // SUM(CASE WHEN we THEN 0 ELSE 1 END) AS BIGINT)
      |      AS diff_milli
      |  FROM lab),
      |u AS (SELECT * FROM st UNION ALL SELECT * FROM pl),
      |ps AS (SELECT sign(diff_milli) AS s FROM pl)
      |SELECT u.stratum, u.diff_milli,
      |  sign(u.diff_milli) = ps.s AS agrees_with_pooled
      |FROM u CROSS JOIN ps ORDER BY u.stratum""".stripMargin

  /** q223: two-sample Kolmogorov–Smirnov — do weekend and weekday
    * daily revenues come from the same distribution? The statistic is
    * EXACT integers end to end: at every observed value,
    * |F_A·n_B − F_B·n_A| (the cross-multiplied ECDF gap) is an int64,
    * its max is an int64, and only the final d_e6 division touches
    * doubles. One value-grain aggregation + one cumulative window
    * over the ~2.4k distinct daily values.
    */
  def ksWeekend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
      .withColumn("we", dayofweek(col("day")).isin(1, 7))
    val byValue = daily.groupBy(col("rev"))
      .agg(sum(when(col("we"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("we"), 1L).otherwise(0L)).as("cb"))
    // distinct-value grain: input is the per-rev-value aggregate (the
    // KS statistic's own grain), day-bounded here
    val w = Window.orderBy(col("rev").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = byValue.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    byValue
      .withColumn("fa", sum(col("ca")).over(w))
      .withColumn("fb", sum(col("cb")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("__gap",
        abs(col("fa") * col("nb") - col("fb") * col("na")))
      .groupBy()
      .agg(max(col("na")).as("n_weekend"), max(col("nb")).as("n_weekday"),
        max(col("__gap")).as("__d"))
      .withColumn("d_e6",
        floor(col("__d").cast("double") * 1e6 /
          (col("n_weekend") * col("n_weekday")).cast("double"))
          .cast("long"))
      .drop("__d")
  }

  val ksWeekendSql: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM orders GROUP BY 1),
      |lab AS (SELECT rev, dayofweek(day) IN (0, 6) AS we FROM daily),
      |bv AS (SELECT rev,
      |    CAST(SUM(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN we THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM lab GROUP BY rev),
      |cum AS (SELECT rev, ca, cb,
      |    SUM(ca) OVER (ORDER BY rev ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
      |    SUM(cb) OVER (ORDER BY rev ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
      |  FROM bv),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |    CAST(SUM(cb) AS BIGINT) AS nb FROM bv)
      |SELECT tot.na AS n_weekend, tot.nb AS n_weekday,
      |  CAST(FLOOR(CAST(MAX(abs(cum.fa * tot.nb - cum.fb * tot.na))
      |      AS DOUBLE) * 1e6
      |    / CAST(tot.na * tot.nb AS DOUBLE)) AS BIGINT) AS d_e6
      |FROM cum CROSS JOIN tot GROUP BY tot.na, tot.nb""".stripMargin

  /** q224: best decision STUMP — the single-split classifier (CART's
    * building block) for "does quantity predict a return?": for every
    * candidate threshold t, misclassification count = min(pos, neg) on
    * each side of qty ≤ t, minimized with ties to the smallest t —
    * pure integer counting over one cumulative window at value grain
    * (≤ 50 distinct quantities), the exact stump no sampling could
    * misplace.
    */
  def decisionStump(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQty = t(s, dir, "lineitem")
      .groupBy(floor(col("l_quantity")).cast("long").as("qty"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("pos"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L))
          .as("neg"))
    // distinct-threshold grain: one row per candidate qty cut (the
    // stump sweep's aggregate input, ~50 distinct quantities)
    val w = Window.orderBy(col("qty").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = byQty.agg(sum(col("pos")).as("tp"), sum(col("neg")).as("tn"))
    val scored = byQty
      .withColumn("pl", sum(col("pos")).over(w))
      .withColumn("nl", sum(col("neg")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("errors",
        least(col("pl"), col("nl")) +
          least(col("tp") - col("pl"), col("tn") - col("nl")))
    // same distinct-threshold grain as the sweep above (argmin pick)
    val best = Window.orderBy(col("errors").asc, col("qty").asc)
    scored.withColumn("__rn", row_number().over(best))
      .where(col("__rn") === 1)
      .select(col("qty").as("threshold"), col("errors"),
        (col("tp") + col("tn")).as("n"),
        expr("(tp + tn - errors) * 1000000L div (tp + tn)")
          .as("accuracy_ppm"))
  }

  val decisionStumpSql: String =
    """WITH bq AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos,
      |    CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS neg
      |  FROM lineitem GROUP BY 1),
      |cum AS (SELECT qty,
      |    SUM(pos) OVER (ORDER BY qty ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl,
      |    SUM(neg) OVER (ORDER BY qty ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl
      |  FROM bq),
      |tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS tp,
      |    CAST(SUM(neg) AS BIGINT) AS tn FROM bq),
      |sc AS (SELECT cum.qty,
      |    LEAST(cum.pl, cum.nl)
      |      + LEAST(tot.tp - cum.pl, tot.tn - cum.nl) AS errors,
      |    tot.tp + tot.tn AS n, tot.tp, tot.tn
      |  FROM cum CROSS JOIN tot)
      |SELECT qty AS threshold, CAST(errors AS BIGINT) AS errors,
      |  CAST(n AS BIGINT) AS n,
      |  CAST((tp + tn - errors) * 1000000 // (tp + tn) AS BIGINT)
      |    AS accuracy_ppm
      |FROM sc ORDER BY errors ASC, qty ASC LIMIT 1""".stripMargin

  /** q225: VaR / CVaR from the daily revenue-change series — the
    * tail-risk readout: VaR95 = the lower nearest-rank 5th percentile
    * of signed day-over-day changes (an ACTUAL day's change), CVaR =
    * the floor-milli mean of the tail at or below it (signed → the
    * q160 double-floor rule). Day-grain aggregate, one lag window,
    * one rank window.
    */
  def varCvar(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
    val chg = daily
      // day-grain global window (calendar-bounded aggregate input)
      .withColumn("__prev", lag(col("rev"), 1).over(Window.orderBy("day")))
      .where(col("__prev").isNotNull)
      .withColumn("pnl", col("rev") - col("__prev"))
    val w = Window.orderBy(col("pnl").asc, col("day").asc)
    val ranked = chg.withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(lit(1))))
    val varRow = ranked
      .where(col("__r") === expr("greatest(1L, (__n * 50000L) div 1000000L)"))
      .select(col("pnl").as("var95_cents"), col("__n").as("n_days"))
    ranked.crossJoin(broadcast(varRow))
      .where(col("pnl") <= col("var95_cents"))
      .groupBy()
      .agg(max(col("n_days")).as("n_days"),
        max(col("var95_cents")).as("var95_cents"),
        count(lit(1)).as("n_tail"),
        floor(sum(col("pnl")).cast("double") * 1000.0 /
          count(lit(1)).cast("double")).cast("long").as("cvar_milli"))
  }

  val varCvarSql: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM orders GROUP BY 1),
      |chg AS (SELECT day,
      |    rev - LAG(rev) OVER (ORDER BY day) AS pnl
      |  FROM daily QUALIFY pnl IS NOT NULL),
      |rk AS (SELECT day, pnl,
      |    ROW_NUMBER() OVER (ORDER BY pnl ASC, day ASC) AS r,
      |    COUNT(*) OVER () AS n
      |  FROM chg),
      |v AS (SELECT CAST(pnl AS BIGINT) AS var95_cents,
      |    CAST(n AS BIGINT) AS n_days
      |  FROM rk WHERE r = GREATEST(1, (n * 50000) // 1000000))
      |SELECT v.n_days, v.var95_cents,
      |  CAST(COUNT(*) AS BIGINT) AS n_tail,
      |  CAST(FLOOR(CAST(SUM(rk.pnl) AS DOUBLE) * 1000.0
      |    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cvar_milli
      |FROM rk CROSS JOIN v WHERE rk.pnl <= v.var95_cents
      |GROUP BY v.n_days, v.var95_cents""".stripMargin

  /** q226: dedup-cluster COHESION audit — per connected-component
    * near-dup group: member count, verified-pair count, and the
    * min / floor-e4-mean within-group Jaccard — the quality readout
    * that catches chained-together clusters (A~B~C where A and C are
    * NOT similar: min ≪ threshold exposes transitive drift) before a
    * survivor policy collapses them. Means sum e4-quantized integers
    * (never raw doubles — float Σ is reduction-order-dependent).
    */
  def dedupCohesion(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLSH(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.7)
      .localCheckpoint(true) // feeds both the label pass and the metrics
    val labels = Dedup.connectedComponents(pairs)
    val perGroup = pairs
      .join(labels.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("jaccard")).as("min_jaccard"),
        expr("sum(CAST(round(jaccard * 1e4) AS BIGINT)) div count(1)")
          .as("mean_jac_e4"))
    labels.groupBy(col("group_id")).agg(count(lit(1)).as("n_members"))
      .join(perGroup, Seq("group_id"))
      .orderBy("group_id")
  }

  val dedupCohesionSql: String =
    s"""$componentLabelsSqlPrefix,
       |pj AS (SELECT l.group_id, p.jaccard
       |  FROM pairs p JOIN labels l ON l.id = p.id_a),
       |pg AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    MIN(jaccard) AS min_jaccard,
       |    CAST(SUM(CAST(round(jaccard * 1e4) AS BIGINT))
       |      // COUNT(*) AS BIGINT) AS mean_jac_e4
       |  FROM pj GROUP BY group_id),
       |nm AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n_members
       |  FROM labels GROUP BY group_id)
       |SELECT nm.group_id, nm.n_members, pg.n_pairs, pg.min_jaccard,
       |  pg.mean_jac_e4
       |FROM nm JOIN pg USING (group_id) ORDER BY group_id""".stripMargin

  /** q227: session BOUNCE report — per entry event type: sessions
    * started (native session_window semantics via the islands rule),
    * bounce share (single-event sessions) and floor-milli mean session
    * length — the landing-page diagnostic. Entry type = the session's
    * (ts, event_id)-first event; all integer counts and ppm.
    */
  def bounceReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("ts"),
      col("event_id"), col("event_type"))
    val wu = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val sess = e
      .withColumn("__prev", lag(col("ts"), 1).over(wu))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          col("ts") - col("__prev") >= 1800L * 1000000000L, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__brk")).over(
        wu.rowsBetween(Window.unboundedPreceding, 0)))
    val perSession = sess.groupBy(col("user_id"), col("__sid"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .as("__first"))
      .select(col("__first.event_type").as("entry_type"), col("n_events"))
    perSession.groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"),
        sum(col("n_events")).as("__ne"))
      .withColumn("bounce_ppm", expr("n_bounces * 1000000L div n_sessions"))
      .withColumn("mean_events_milli", expr("__ne * 1000L div n_sessions"))
      .drop("__ne")
      .orderBy("entry_type")
  }

  val bounceReportSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id,
      |    event_type FROM events),
      |l AS (SELECT *, LAG(tns) OVER (PARTITION BY user_id
      |    ORDER BY tns, event_id) AS prev FROM e),
      |o AS (SELECT *, CASE WHEN prev IS NULL
      |    OR tns - prev >= 1800000000000 THEN 1 ELSE 0 END AS brk
      |  FROM l),
      |sid AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
      |    ORDER BY tns, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sd
      |  FROM o),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sd
      |    ORDER BY tns, event_id) AS rn FROM sid),
      |ps AS (SELECT user_id, sd, COUNT(*) AS ne FROM sid
      |  GROUP BY user_id, sd),
      |pe AS (SELECT rk.event_type AS entry_type, ps.ne
      |  FROM rk JOIN ps ON ps.user_id = rk.user_id AND ps.sd = rk.sd
      |  WHERE rk.rn = 1)
      |SELECT entry_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bounces,
      |  CAST(SUM(CASE WHEN ne = 1 THEN 1 ELSE 0 END) * 1000000
      |    // COUNT(*) AS BIGINT) AS bounce_ppm,
      |  CAST(SUM(ne) * 1000 // COUNT(*) AS BIGINT) AS mean_events_milli
      |FROM pe GROUP BY entry_type ORDER BY entry_type""".stripMargin

  /** q228: corpus PANORAMA capstone — one per-language health sheet
    * joining ALL THREE domains: document volume/length, near-dup
    * exposure (members of ≥1 verified LSH pair — the q18 set), and
    * embedding-space dispersion (floor-mean squared-L2 of each
    * language's e6-quantized vectors to their own integer centroid,
    * doc_id = vec_id). The release-review dashboard row, exact end to
    * end.
    */
  def corpusPanorama(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val base = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val pairs = Dedup.minhashLSH(docs, "doc_id", "text", threshold = 0.7)
    val exposed = pairs.select(explode(array(col("id_a"), col("id_b")))
        .as("doc_id")).distinct()
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_neardup_docs"))
    val q = t(s, dir, "embeddings")
      .join(docs.select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id"))
      .select(col("lang"), col("vec_id"),
        posexplode(transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1000000.0)).cast("long")))
          .as(Seq("pos", "qv")))
    val cent = q.groupBy(col("lang").as("__cl"), col("pos"))
      .agg(floor(sum(col("qv")).cast("double") /
        count(lit(1)).cast("double")).cast("long").as("cv"))
    val disp = q.join(cent,
        col("__cl") === col("lang") && cent("pos") === q("pos"))
      .groupBy(col("lang"), col("vec_id"))
      .agg(sum((col("qv") - col("cv")) * (col("qv") - col("cv")))
        .as("__d"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(__d) div count(1)").as("mean_sq_disp"))
    base.join(exposed, Seq("lang"), "left")
      .na.fill(0L, Seq("n_neardup_docs"))
      .join(disp, Seq("lang"), "left")
      .orderBy("lang")
  }

  val corpusPanoramaSql: String =
    s"""WITH base AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |  FROM documents GROUP BY lang),
       |pairs AS (${allPairsJaccardSql(0.7).replace(
              "ORDER BY id_a, id_b", "")}),
       |exp0 AS (SELECT DISTINCT id FROM (
       |  SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs)),
       |expl AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_neardup_docs
       |  FROM exp0 JOIN documents d ON d.doc_id = exp0.id
       |  GROUP BY d.lang),
       |q AS (SELECT d.lang, e.vec_id, i.i AS pos,
       |    CAST(FLOOR(CAST(e.embedding[i.i + 1] AS DOUBLE) * 1000000.0)
       |      AS BIGINT) AS qv
       |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
       |cent AS (SELECT lang, pos,
       |    CAST(FLOOR(CAST(SUM(qv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
       |      AS BIGINT) AS cv
       |  FROM q GROUP BY 1, 2),
       |dv AS (SELECT q.lang, q.vec_id,
       |    SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
       |  FROM q JOIN cent c ON c.lang = q.lang AND c.pos = q.pos
       |  GROUP BY 1, 2),
       |disp AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |    CAST(SUM(d) // COUNT(*) AS BIGINT) AS mean_sq_disp
       |  FROM dv GROUP BY lang)
       |SELECT base.lang, base.n_docs, base.total_chars,
       |  COALESCE(expl.n_neardup_docs, 0) AS n_neardup_docs,
       |  disp.n_vecs, disp.mean_sq_disp
       |FROM base LEFT JOIN expl USING (lang)
       |LEFT JOIN disp USING (lang)
       |ORDER BY base.lang""".stripMargin

  /** q229: median + MAD report — the robust location/scale summary
    * per group (the readout [[Stats.robustOutliers]] thresholds
    * against, standalone): both are LOWER nearest-rank member values
    * (cents — no interpolated float blend), MAD via one deviation
    * pass against the broadcast medians.
    */
  def medianMadReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
      floor(col("l_extendedprice") * 100).cast("long").as("v"))
    def lowerMedian(df: org.apache.spark.sql.DataFrame, c: String) = {
      val w = Window.partitionBy(col("g")).orderBy(col(c).asc)
      df.withColumn("__r", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("g"))))
        .where(col("__r") === expr("(__n + 1L) div 2"))
        .select(col("g"), col(c).as(s"med_$c"), col("__n").as("n"))
    }
    val med = lowerMedian(rows, "v")
    val dev = rows.join(med.select(col("g"), col("med_v")), Seq("g"))
      .withColumn("d", abs(col("v") - col("med_v")))
    lowerMedian(dev, "d").drop("n")
      .join(med, Seq("g"))
      .select(col("g").as("l_returnflag"), col("n"),
        col("med_v").as("median_cents"), col("med_d").as("mad_cents"))
      .orderBy("l_returnflag")
  }

  val medianMadReportSql: String =
    """WITH r AS (SELECT l_returnflag AS g,
      |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
      |  FROM lineitem),
      |rk AS (SELECT g, v,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY v ASC) AS r,
      |    COUNT(*) OVER (PARTITION BY g) AS n
      |  FROM r),
      |med AS (SELECT g, v AS med_v, CAST(n AS BIGINT) AS n FROM rk
      |  WHERE r = (n + 1) // 2),
      |dev AS (SELECT r.g, abs(r.v - med.med_v) AS d
      |  FROM r JOIN med ON med.g = r.g),
      |dk AS (SELECT g, d,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY d ASC) AS r,
      |    COUNT(*) OVER (PARTITION BY g) AS n
      |  FROM dev),
      |mad AS (SELECT g, d AS mad_d FROM dk WHERE r = (n + 1) // 2)
      |SELECT med.g AS l_returnflag, med.n, med.med_v AS median_cents,
      |  mad.mad_d AS mad_cents
      |FROM med JOIN mad ON mad.g = med.g ORDER BY l_returnflag""".stripMargin

  /** q230: open-order BACKLOG aging — non-finished orders bucketed by
    * age in 30-day bands at the corpus's own snapshot (max order
    * date): counts and cents per (status, band) — the operations
    * dashboard row, exact integer banding against a lazily-derived
    * snapshot (no eager driver max).
    */
  def backlogAging(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderstatus").as("st"),
      to_date(col("o_orderdate")).as("odate"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val snap = o.agg(max(col("odate")).as("__snap"))
    o.where(col("st") =!= "F")
      .crossJoin(broadcast(snap))
      .withColumn("age_band",
        expr("datediff(__snap, odate) div 30"))
      .groupBy(col("st").as("o_orderstatus"), col("age_band"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .orderBy("o_orderstatus", "age_band")
  }

  val backlogAgingSql: String =
    """WITH o AS (SELECT o_orderstatus AS st,
      |    CAST(o_orderdate AS DATE) AS odate,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |snap AS (SELECT MAX(odate) AS sd FROM o)
      |SELECT o.st AS o_orderstatus,
      |  CAST(datediff('day', o.odate, snap.sd) // 30 AS BIGINT)
      |    AS age_band,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(o.cents) AS BIGINT) AS cents
      |FROM o CROSS JOIN snap WHERE o.st <> 'F'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
