package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over an event stream: ordered-step funnels,
  * cohort retention and first-order transition matrices — the product-
  * analytics queries every events warehouse runs daily, built so every
  * metric is an exact integer (counts and floor-ppm), replayable on any
  * engine and any partitioning.
  *
  * 100 TB design notes:
  *  - Everything keys on the user column: each stage is ONE map-side-
  *    combined shuffle on that key, and chained stages reuse the same
  *    hash partitioning (no re-shuffle between "reached step i" and
  *    "reached step i+1" — AQE sees co-partitioned sides).
  *  - Per-user state never materializes an event list: funnels carry
  *    one timestamp per (user, step), retention one bucket per
  *    (user, period), transitions a LAG over the per-user sort that
  *    Spark evaluates inside the partition.
  *  - Final reports are aggregate-grain (steps, cohort x offset,
  *    |event types|^2 rows): the tiny windows/joins that decorate them
  *    with shares are provably bounded.
  */
object Behavior {

  /** Strict-sequence funnel: a user reaches step i+1 with the earliest
    * event matching `steps(i+1)`'s predicate STRICTLY AFTER their
    * step-i timestamp (the classic "first view, then first click after
    * that view, ..." semantics — re-orderings don't count, same-
    * timestamp events don't count). Returns one row per step:
    * `(step, step_name, users, conv_ppm, step_ppm)` with conv_ppm the
    * floor-ppm share of step-1 users and step_ppm of the previous
    * step's users (step 1 → 1e6 by definition; empty funnel → 0).
    *
    * ONE shuffle for any number of steps: inside the per-user sort, a
    * step-i event QUALIFIES iff some qualifying step-(i−1) event has a
    * strictly smaller timestamp — an exclusive-prefix running min over
    * a RANGE frame (`[unbounded, ts−1]`, so equal timestamps never
    * chain). "First qualifying" and "first after the chain's min" pick
    * the same events, so this per-row formulation is exactly the
    * min-timestamp chaining, without the per-step join+agg passes the
    * naive plan pays (k windows share one partition+sort; the per-user
    * flags then collapse in an aggregation that REUSES the window's
    * hash partitioning). `tsCol` must be numeric — the RANGE frame
    * needs value arithmetic (convert timestamps to epoch units first).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc)
      .rangeBetween(Window.unboundedPreceding, -1)
    // qual(i) = ts of this event if it extends the chain at step i
    val seeded = events
      .withColumn("__bh_q0", when(steps.head._2, col(tsCol)))
    val qualified = steps.tail.zipWithIndex.foldLeft(seeded) {
      case (df, ((_, pred), i)) =>
        df.withColumn(s"__bh_q${i + 1}",
          when(pred && min(col(s"__bh_q$i")).over(w).isNotNull, col(tsCol)))
    }
    val flagExprs = steps.indices.map(i =>
      max(col(s"__bh_q$i").isNotNull).as(s"__bh_r$i"))
    val flags = qualified.groupBy(col(userCol))
      .agg(flagExprs.head, flagExprs.tail: _*)
    val totExprs = steps.indices.map(i =>
      coalesce(sum(when(col(s"__bh_r$i"), 1L).otherwise(0L)), lit(0L))
        .as(s"__bh_n$i"))
    val totals = flags.agg(totExprs.head, totExprs.tail: _*)
    val packed = steps.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1L).as("step"), lit(name).as("step_name"),
        col(s"__bh_n$i").as("users"))
    }
    val counts = totals
      .select(explode(array(packed: _*)).as("c"))
      .select(col("c.step"), col("c.step_name"), col("c.users"))
    // report grain = k steps: the global window and cross join are
    // bounded by construction
    val stepW = Window.orderBy("step")
    counts
      .crossJoin(broadcast(
        counts.where(col("step") === 1L).select(col("users").as("__bh_u1"))))
      .withColumn("__bh_prev", lag(col("users"), 1, null).over(stepW))
      .select(col("step"), col("step_name"), col("users"),
        when(col("__bh_u1") === 0L, 0L)
          .otherwise(expr("(users * 1000000) div __bh_u1")).as("conv_ppm"),
        when(col("__bh_prev").isNull,
            when(col("users") === 0L, 0L).otherwise(lit(1000000L)))
          .when(col("__bh_prev") === 0L, 0L)
          .otherwise(expr("(users * 1000000) div __bh_prev")).as("step_ppm"))
  }

  /** Cohort retention: users are cohorted by the period of their first
    * event (`periodCol div bucket`), then counted once per (cohort,
    * offset) where offset = active period − cohort period. Returns
    * `(cohort, offset, active_users, cohort_size, retained_ppm)`;
    * offset 0 always has retained_ppm = 1e6. `periodCol` must be an
    * integral column (e.g. a day number); bucket groups it into
    * retention periods (7 = weekly cohorts from day grain).
    *
    * Two map-side-combined shuffles on the user key (first-seen +
    * distinct active periods) that AQE co-partitions for the join; the
    * cohort-size decoration joins at cohort grain (bounded by the
    * calendar).
    */
  def retention(events: DataFrame, userCol: String, periodCol: String,
      bucket: Int): DataFrame = {
    require(bucket >= 1, "bucket must be >= 1")
    val ev = events.select(col(userCol).as("__bh_u"),
      expr(s"CAST($periodCol AS BIGINT) div $bucket").as("__bh_p"))
    val firstSeen = ev.groupBy(col("__bh_u")).agg(min(col("__bh_p")).as("cohort"))
    val active = ev.distinct()
    val cells = active.join(firstSeen, "__bh_u")
      .groupBy(col("cohort"), (col("__bh_p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = firstSeen.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("offset"), col("active_users"), col("cohort_size"),
        expr("(active_users * 1000000) div cohort_size").as("retained_ppm"))
  }

  /** First-order transition matrix: per user, events sorted by
    * (`tsCol`, `tieCol`); each consecutive pair contributes one
    * (src, dst) transition. Returns `(src, dst, transitions, p_ppm)`
    * with p_ppm the floor-ppm share of all transitions leaving src —
    * the empirical Markov row, exact and engine-replayable.
    *
    * The LAG runs inside the per-user sort (one shuffle on the user
    * key, per-partition window — no global sort); the matrix itself is
    * |distinct states|^2 grain, so the per-src share window is bounded.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol), col(stateCol).as("dst"))
      .withColumn("src", lag(col("dst"), 1, null).over(w))
      .where(col("src").isNotNull)
    val counts = pairs.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("transitions"))
    val srcW = Window.partitionBy(col("src"))
    counts
      .withColumn("__bh_tot", sum(col("transitions")).over(srcW))
      .select(col("src"), col("dst"), col("transitions"),
        expr("(transitions * 1000000) div __bh_tot").as("p_ppm"))
  }

  /** Top journey paths: every length-`n` run of consecutive states per
    * user (sliding, LEAD-chained — the n-gram generalization of
    * [[transitions]]), counted and ranked `(count desc, path asc)`
    * down to `topK` rows. Paths render as `s1>s2>...>sn`.
    *
    * The LEAD chain is one per-user window pass (no event-list
    * buffering); path counting is one map-side-combined shuffle on the
    * path string. The final orderBy+limit runs on the AGGREGATE-GRAIN
    * path table — at most |distinct states|^n rows, orders of
    * magnitude below the event count — and Spark bounds it further
    * (TakeOrderedAndProject below the top-k fallback threshold, else
    * sort + limit on that already-collapsed table).
    *
    * `stateCol` must be non-null (a null mid-run would silently drop
    * out of the rendered path) — filter or coalesce upstream.
    */
  def pathNgrams(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, stateCol: String, n: Int, topK: Int): DataFrame = {
    require(n >= 2, s"paths need n >= 2 states, got $n")
    require(topK >= 1, s"topK must be positive, got $topK")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val legs = (0 until n).map(i =>
      lead(col(stateCol), i).over(w).as(s"__bh_s$i"))
    events.select(legs: _*)
      .where(col(s"__bh_s${n - 1}").isNotNull)
      .select(concat_ws(">", (0 until n).map(i => col(s"__bh_s$i")): _*)
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topK)
  }

  /** Per-user conversion latency: time from the user's FIRST event
    * matching `fromPred` to their FIRST matching `toPred` that comes
    * strictly after it — the "how fast do users convert" companion to
    * [[funnel]] (which answers how many). Users without both events,
    * or whose conversion precedes their first touch, emit nothing.
    *
    * One map-side-combined groupBy(user) with two conditional mins —
    * no window, no sort; latencies are exact integer differences in
    * the ts unit, ready for percentile_disc reporting downstream.
    */
  def conversionLatency(events: DataFrame, userCol: String, tsCol: String,
      fromPred: Column, toPred: Column): DataFrame =
    events
      .groupBy(col(userCol).as("user"))
      .agg(min(when(fromPred, col(tsCol))).as("__from"),
        min(when(toPred, col(tsCol))).as("__to"))
      .where(col("__from").isNotNull && col("__to").isNotNull &&
        col("__to") > col("__from"))
      .select(col("user"), (col("__to") - col("__from")).as("latency"))

  /** Multi-touch attribution: distribute each conversion's value over
    * the touch events that preceded it within a lookback window, under
    * the three standard models at once — first-touch, last-touch, and
    * linear. The "which channel earned this purchase" report.
    *
    * Pairing is the [[RangeJoin]] bucketed equi-join (touch in
    * (conv_ts − lookback, conv_ts], both sides bucketed by the lookback
    * so a conversion probes exactly 2 buckets — no range scan, no
    * per-user sort of the full event stream). Per (conversion, channel)
    * the pairs collapse IMMEDIATELY to (count, min/max (ts, id)) — the
    * pair table never reaches a second wide shuffle; first/last then
    * resolve per conversion with whole-partition window aggregates over
    * the ≤|channels| collapsed rows, and one final channel groupBy
    * emits all three models from the same rows.
    *
    * Exactness: values enter as floor-cents (integer); linear shares
    * are `v·cnt_c div n` floor division (each conversion drops ≤ n−1
    * residual cents — deterministic, documented, engine-identical; the
    * first/last models are residual-free). Ties on identical
    * timestamps break by touch event id, so first/last are total
    * orders. Conversions with NO touch in the window appear under
    * channel `(none)` with full value in every model — the report sums
    * to sum-of-conversions per model (minus the linear residue) by
    * construction.
    *
    * @param lookback window length in tsCol's (numeric) unit
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookback: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    val conv = events.where(col(typeCol) === convType)
      .select(col(userCol).as("k"), col(tsCol).as("ct"),
        col(idCol).as("conv_id"),
        coalesce(floor(col(valueCol) * 100).cast("long"), lit(0L)).as("v"))
    val touch = events
      .where(col(typeCol).isin(touchTypes.map(_.asInstanceOf[Any]): _*))
      .select(col(userCol).as("k"), col(tsCol).as("tt"),
        col(idCol).as("touch_id"), col(typeCol).as("channel"))
      .withColumn("bucket", expr(s"tt div $lookback"))
    val probes = conv.select(col("k"), col("ct"), col("conv_id"), col("v"),
      explode(array(expr(s"ct div $lookback"),
        expr(s"ct div $lookback") - 1)).as("bucket"))
    val perConvChannel = probes.join(touch, Seq("k", "bucket"))
      .where(col("tt") > col("ct") - lookback && col("tt") <= col("ct"))
      .groupBy(col("conv_id"), col("v"), col("channel"))
      .agg(count(lit(1)).as("cnt_c"),
        min(struct(col("tt"), col("touch_id"))).as("ft"),
        max(struct(col("tt"), col("touch_id"))).as("lt"))
    val wConv = Window.partitionBy(col("conv_id"))
    val resolved = perConvChannel
      .withColumn("n", sum(col("cnt_c")).over(wConv))
      .withColumn("is_first", min(col("ft")).over(wConv) === col("ft"))
      .withColumn("is_last", max(col("lt")).over(wConv) === col("lt"))
    val attributed = resolved.groupBy(col("channel")).agg(
      sum(when(col("is_first"), 1L).otherwise(0L)).as("first_convs"),
      sum(when(col("is_first"), col("v")).otherwise(0L)).as("first_cents"),
      sum(when(col("is_last"), 1L).otherwise(0L)).as("last_convs"),
      sum(when(col("is_last"), col("v")).otherwise(0L)).as("last_cents"),
      sum(col("cnt_c")).as("touches"),
      sum(expr("v * cnt_c div n")).as("linear_cents"))
    val untouched = conv
      .join(perConvChannel.select(col("conv_id")).distinct(),
        Seq("conv_id"), "left_anti")
      .agg(count(lit(1)).as("first_convs"), sum(col("v")).as("first_cents"))
      .select(lit("(none)").as("channel"),
        col("first_convs"), coalesce(col("first_cents"), lit(0L)).as("first_cents"),
        col("first_convs").as("last_convs"),
        coalesce(col("first_cents"), lit(0L)).as("last_cents"),
        lit(0L).as("touches"),
        coalesce(col("first_cents"), lit(0L)).as("linear_cents"))
    attributed.unionByName(untouched)
  }

  /** KAPLAN–MEIER survival curve — churn/retention analysis done
    * right-censoring-aware (a user still active at observation end is
    * NOT a churn at their last-seen time; naive retention curves that
    * ignore censoring bias survival down): at each duration t with
    * d_t ≥ 1 events, S(t) = Π_{u ≤ t} (1 − d_u/n_u) with n_u the
    * at-risk count (subjects with duration ≥ u).
    *
    * Engine-replayability of the PRODUCT chain: every factor
    * (n−d)/n is one IEEE division of exact integers; the cumulative
    * product is a LEFT FOLD over the time-ordered factor array (Spark
    * `aggregate` HOF ≡ DuckDB `list_reduce` over DOUBLEs — the same
    * multiply sequence, so the result is bit-identical; no exp/ln
    * round-trip whose libm could differ). Factors also emit as exact
    * `(n−d)·1e6 div n` integers, and survival as floor-e6.
    *
    * 100 TB shape: one map-side-combined per-duration aggregation (the
    * curve's grain is DISTINCT DURATIONS — use a coarse unit like
    * days; the step table is aggregate-grain and the at-risk window
    * consumes it, satisfying the PlanSpec boundedness rule), then the
    * fold runs on the collected step array — guarded at `maxSteps` so
    * a per-millisecond duration column fails loudly instead of
    * collecting an unbounded array.
    *
    * @param durationCol non-negative integer durations (e.g. days)
    * @param eventCol    1 = event observed (churned), 0 = censored
    * @return per event-time step: (t, n_risk, d_events, c_censored,
    *         factor_e6, surv_e6), time-ascending
    */
  def kaplanMeier(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      maxSteps: Int = 10000): DataFrame = {
    require(maxSteps >= 1)
    val t = col(durationCol).cast("long")
    val e = col(eventCol).cast("long")
    val rows = df
      .select(t.as("t"),
        when(e === 0L || e === 1L, e).otherwise(raise_error(concat(
          lit(s"Behavior.kaplanMeier: $eventCol must be 0 (censored) or " +
            "1 (event), got "), e.cast("string"))).cast("long")).as("e"))
      .where(col("t").isNotNull && col("t") >= 0)
    val byT = rows.groupBy(col("t"))
      .agg(sum(col("e")).as("d"), (count(lit(1)) - sum(col("e"))).as("c"))
    val total = rows.agg(count(lit(1)).as("__n"))
    // time-grain global window: input is the per-t aggregate (distinct
    // event times), the Kaplan-Meier product's own grain
    val wPrior = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // at-risk = total minus everyone who exited strictly earlier;
    // unpartitioned window over AGGREGATE-grain input (duration steps)
    val steps = byT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("__n") - coalesce(sum(col("d") + col("c")).over(wPrior), lit(0L)))
      .where(col("d") > 0)
      .withColumn("factor_e6", expr("(n_risk - d) * 1000000L div n_risk"))
      .withColumn("__f", (col("n_risk") - col("d")).cast("double") /
        col("n_risk").cast("double"))
    val packed = steps
      .agg(array_sort(collect_list(struct(col("t"), col("n_risk"),
        col("d"), col("c"), col("factor_e6"), col("__f")))).as("arr"))
      .select(expr(
        s"""CASE WHEN size(arr) <= $maxSteps THEN arr
           |ELSE raise_error(concat('Behavior.kaplanMeier: ',
           |  cast(size(arr) AS string), ' curve steps (> $maxSteps); ',
           |  'coarsen the duration unit (days, not millis)'))
           |END""".stripMargin).as("arr"))
    packed
      .select(posexplode(col("arr")).as(Seq("__i", "s")),
        col("arr"))
      .withColumn("surv_e6", floor(expr(
        "aggregate(slice(transform(arr, x -> x.__f), 1, __i + 1), " +
          "cast(1.0 as double), (a, x) -> a * x)") * lit(1000000.0))
        .cast("long"))
      .select(col("s.t").as("t"), col("s.n_risk").as("n_risk"),
        col("s.d").as("d_events"), col("s.c").as("c_censored"),
        col("s.factor_e6").as("factor_e6"), col("surv_e6"))
  }

  /** Per-key QUOTA admission — deterministic replay of a rate-limit /
    * sampling-cap policy over an event log: within each (key, window)
    * the first `quota` events by (ts, tie) are admitted, the rest
    * rejected — the batch twin of an API rate limiter, and the
    * "at most N documents per domain per day" cap every crawl-derived
    * training corpus enforces. The (ts, tie) total order makes the
    * SAME events win on every engine and every rerun — a quota that
    * admits different rows per run poisons incremental pipelines.
    *
    * 100 TB shape: ONE group-partitioned window (key, window) ordered
    * by (ts, tie) — the [[Sessionize]] shuffle shape; no global sort,
    * no join. Window id = ts div windowSize (int64 event-time
    * contract).
    *
    * @return input rows + `win` (window id), `seq` (1-based arrival
    *         rank in window), `admitted`
    */
  def quotaAdmit(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      windowSize: Long,
      quota: Int): DataFrame = {
    require(windowSize > 0 && quota >= 1)
    val win = expr(s"`$tsCol` div ${windowSize}L")
    val w = Window.partitionBy(col(keyCol), col("win"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    events.withColumn("win", win)
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("admitted", col("seq") <= quota)
  }

  /** MARKOV (removal-effect) attribution — the data-driven model that
    * first/last/linear ([[attribution]]) heuristics approximate: build
    * the first-order journey chain (START → touches → CONV | NULL),
    * compute each channel's removal effect — how much absorption
    * probability the chain LOSES when that channel's node is knocked
    * out (its inbound transitions dead-end) — and attribute conversion
    * credit proportionally (Anderl et al. 2014's framework).
    *
    * Determinism: absorption probabilities come from a FIXED number of
    * value-iteration passes in scaled-integer arithmetic —
    * P_{i+1}(u) = (Σ_v cnt(u→v) · val_i(v)) div cnt(u→·) at scale
    * 1e12, the q97 PageRank recipe — so every engine replays every
    * digit; `iters` is part of the contract like [[Graph.kCore]]'s
    * round budget (absorption converges geometrically; 12 passes ≈
    * journeys of length ≤ 12 fully credited).
    *
    * Plan: ONE data-sized pass builds per-user ordered transitions
    * (the [[transitions]] lag window, cut at the first conversion) and
    * aggregates them to a (states × states)-bounded count table; that
    * table is collected (model-sized, like k-modes centers — guarded
    * at 10k rows) and the 1 + |channels| value iterations run in exact
    * driver-side long arithmetic on it. Nothing data-sized ever loops.
    *
    * @return one row per non-conversion channel:
    *         (channel, p_base_e12, p_removed_e12, effect_ppm of base,
    *         share_ppm of total effect), ordered by channel
    */
  def markovAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      channelCol: String,
      convChannel: String,
      iters: Int = 12,
      maxStates: Int = 100): DataFrame = {
    require(iters >= 1 && maxStates >= 2)
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t").asc, col("tb").asc)
    val seq0 = events
      .select(col(userCol).as("u"), col(tsCol).as("t"), col(tieCol).as("tb"),
        col(channelCol).cast("string").as("ch"))
      .where(col("ch").isNotNull)
      .withColumn("__cum",
        sum((col("ch") === convChannel).cast("long")).over(w))
      // keep everything up to and INCLUDING the first conversion
      .where(col("__cum") === 0 ||
        (col("__cum") === 1 && col("ch") === convChannel))
    val steps = seq0
      .withColumn("__prev", lag(col("ch"), 1, "START").over(w))
      .select(col("u"), col("__prev").as("src"),
        when(col("ch") === convChannel, lit("CONV")).otherwise(col("ch"))
          .as("dst"))
    // terminal edge for non-converters: last touch -> NULL
    val lastTouch = seq0.where(col("ch") =!= convChannel)
      .groupBy(col("u")).agg(max(struct(col("t"), col("tb"), col("ch"))).as("__l"))
      .join(steps.where(col("dst") === "CONV").select(col("u")).distinct()
        .withColumn("__conv", lit(1)), Seq("u"), "left")
      .where(col("__conv").isNull)
      .select(col("u"), col("__l.ch").as("src"), lit("NULL").as("dst"))
    val counts = steps.select(col("src"), col("dst"))
      .unionByName(lastTouch.select(col("src"), col("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
    val rows = counts.collect()
    require(rows.length <= maxStates * maxStates,
      s"markovAttribution: ${rows.length} transition pairs exceed the " +
        s"model-sized collect bound ($maxStates^2); a channel column " +
        "this wide is not a channel taxonomy — bucket it first")
    val cnt = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tot = cnt.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val states = (cnt.keys.map(_._1) ++ cnt.keys.map(_._2)).toSeq.distinct
      .filterNot(s => s == "CONV" || s == "NULL").sorted
    val scale = 1000000000000L // 1e12
    def absorb(removed: Option[String]): Long = {
      var p = states.map(_ -> 0L).toMap
      def valOf(v: String, cur: Map[String, Long]): Long = v match {
        case "CONV" => scale
        case "NULL" => 0L
        case s if removed.contains(s) => 0L
        case s => cur.getOrElse(s, 0L)
      }
      for (_ <- 0 until iters) {
        p = states.map { s =>
          val t = tot.getOrElse(s, 0L)
          val v =
            if (t == 0L || removed.contains(s)) 0L
            else {
              // BigInt: Σ cnt·val can pass 2^63 on heavy chains; the
              // oracle's HUGEINT sum is exact too, so both floor-divide
              // the identical numerator
              val num = cnt.iterator.collect {
                case ((`s`, d), c) => BigInt(c) * BigInt(valOf(d, p))
              }.sum
              (num / BigInt(t)).toLong
            }
          s -> v
        }.toMap
      }
      p.getOrElse("START", 0L)
    }
    val base = absorb(None)
    val channels = states.filter(s => s != "START")
    val effects = channels.map { c =>
      val rem = absorb(Some(c))
      c -> math.max(base - rem, 0L)
    }
    val totalEffect = effects.map(_._2).sum
    val out = effects.map { case (c, e) =>
      (c, base, base - e,
        if (base > 0) e * 1000000L / base else 0L,
        if (totalEffect > 0) e * 1000000L / totalEffect else 0L)
    }
    out.toDF("channel", "p_base_e12", "p_removed_e12", "effect_ppm",
        "share_ppm")
      .orderBy("channel")
  }

  /** CLAMPED running balance — the wallet/inventory fold
    * `b_t = max(0, b_{t−1} + d_t)`, which is NOT a plain window sum
    * (the clamp makes it non-associative) but IS exactly the Lindley
    * recursion, whose closed form
    * `b_t = S_t − min(0, min_{s≤t} S_s)` turns the whole sequential
    * fold into two ordinary window passes (prefix sum + prefix min)
    * over integer deltas — the non-obvious window algebra that keeps a
    * 100 TB ledger scan out of a sequential mapPartitions.
    *
    * Per key: end balance, peak clamped balance, and the number of
    * FLOOR EVENTS (rows where the clamp actually bit: S_t < running
    * min of everything before ⇒ the unclamped sum sank to a new low
    * while the clamped balance sat at 0). Deltas are caller-scaled
    * integer cents; the total order is (orderCol, idCol).
    */
  def clampedBalance(
      events: DataFrame,
      keyCol: String,
      orderCol: String,
      idCol: String,
      deltaCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).asc, col(idCol).asc)
    val run = events
      .withColumn("__s", sum(col(deltaCol)).over(w))
      .withColumn("__pm",
        min(col("__s")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__rm", least(lit(0L),
        coalesce(least(col("__pm"), col("__s")), col("__s"))))
      .withColumn("__b", col("__s") - col("__rm"))
      .withColumn("__floored",
        when(col("__s") < least(lit(0L), coalesce(col("__pm"), lit(0L))),
          1L).otherwise(0L))
    run.groupBy(col(keyCol))
      .agg(max_by(col("__b"), struct(col(orderCol), col(idCol)))
          .as("end_balance"),
        max(col("__b")).as("peak_balance"),
        sum(col("__floored")).as("n_floor_events"))
  }
}
