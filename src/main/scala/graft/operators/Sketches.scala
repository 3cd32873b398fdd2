package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable probabilistic sketches for corpus-scale profiling (SURVEY
  * §3.3 family): HyperLogLog distinct-count state, count-min frequency
  * state, and Bloom membership bits. At 100 TB these replace the exact
  * shuffles a pipeline cannot afford to repeat per question: each sketch
  * is built in ONE pass with map-side partial aggregation, its state is
  * tiny (m buckets / d×w cells / ≤ n·k bits), order- and
  * partitioning-independent, and MERGEABLE — states from two corpus
  * halves combine by `max`/`sum`/`union` into the state of the union,
  * so incremental ingest never rescans history.
  *
  * All three use the repo's portable 60-bit md5 hash (the q19/q59
  * technique) instead of Spark-private xxhash64, so an external engine
  * (the DuckDB oracle — q61-q63) reproduces every bucket, cell and bit
  * EXACTLY: the sketches are auditable, not just plausible.
  *
  * HLL determinism note: register values are capped at [[HllRhoCap]] so
  * that every 2^-rho term is a multiple of 2^-40 and the register sum
  * stays exactly representable in an IEEE double REGARDLESS of Spark's
  * aggregation order — the raw estimate is bit-for-bit reproducible
  * across engines (the cap only touches counts near 2^40 distinct,
  * where the 60-bit hash itself is the binding constraint).
  */
object Sketches {

  /** Salted portable hash — delegates to the single shared recipe
    * ([[graft.functions.PortableHash.hash60]], q59's recipe).
    */
  def hash60(key: Column, salt: String = ""): Column =
    graft.functions.PortableHash.hash60(key, salt)

  // ------------------------------------------------------------------- HLL

  /** Bucket count m = 2^6. Fixed (not a parameter) because the rho/cap
    * arithmetic below is proven for this geometry; 64 registers give
    * ~13% standard error — the corpus-profiling sweet spot where the
    * state (64 ints) broadcasts for free.
    */
  val HllBuckets = 64
  private val HllBucketBits = 6

  /** Register cap keeping Σ 2^-rho exactly summable in any order: with
    * rho ≤ 40 every term is a multiple of 2^-40 and the full sum < 96,
    * so all partial sums are integers K·2^-40 with K < 2^47 ≪ 2^53.
    */
  val HllRhoCap = 40

  /** rho = 1 + leading zeros of the 54 post-bucket hash bits: computed
    * via the bit LENGTH of the remaining value (55 - bitlen), which both
    * Spark (`conv(_, 10, 2)`) and DuckDB (`bin`) express as the length
    * of the unpadded binary string — no float log2 anywhere.
    */
  private def rhoCol(h: Column): Column = {
    val w = shiftright(h, HllBucketBits)
    val bitLen = length(conv(w.cast("string"), 10, 2))
    least(when(w === 0, 55).otherwise(lit(55) - bitLen), lit(HllRhoCap))
  }

  /** Per-group HLL state: one row per (group, bucket) with the max rho.
    * ONE shuffle, map-side combined, ≤ |groups|·64 rows out. States
    * merge across batches with the same groupBy-max.
    */
  def hllState(df: DataFrame, keyCol: String, groupCols: Seq[String] = Nil): DataFrame = {
    val h = hash60(col(keyCol))
    val withParts = df.select(
      groupCols.map(col) ++ Seq(
        (h % HllBuckets).cast("int").as("bucket"),
        rhoCol(h).cast("int").as("rho")): _*)
    withParts
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Merge [[hllState]] relations DOWN a grouping level (e.g. per-day
    * states → per-type): register max is associative/commutative/
    * idempotent, so rolling up pre-aggregated states gives EXACTLY the
    * state a direct pass over the raw data would — the property that
    * lets a 100 TB pipeline keep tiny daily sketches and answer
    * arbitrary-range distinct questions without ever rescanning.
    * `groupCols` are the columns to KEEP; dropped ones are merged over.
    */
  def hllMerge(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("max_rho")).as("max_rho"))

  /** Raw (uncorrected) HLL estimate per group from [[hllState]] output:
    * alpha_64 · m² / Σ 2^-M[j], empty registers contributing 2^0. The
    * constant 0.709 is Flajolet et al.'s alpha_64; ·4096 is an exact
    * power-of-two scale, so the folded constant is bit-identical in any
    * IEEE engine (the oracle replays this formula verbatim).
    */
  def hllRawEstimate(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("int").as("buckets_hit"),
        (lit(0.709 * 4096.0) /
          (sum(pow(lit(2.0), -col("max_rho"))) + (lit(HllBuckets) - count(lit(1)))))
          .as("raw_est"))

  /** Pairwise set-OVERLAP estimates from per-group [[hllState]]s via
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where
    * the union estimate comes from register-max merging the two
    * states — the audience-overlap / cross-contamination question
    * ("how many users do these two segments share") answered from
    * sketches alone, no rescan of the raw data (the q77 rollup
    * argument, applied across groups instead of down a hierarchy).
    *
    * The group column is REPORT grain (segments, event types, days):
    * the pair table is its cross product, broadcast to tag each state
    * row into every pair containing its group — state volume is
    * (groups−1)·64 registers, never data-sized. Estimates use the
    * replayable [[hllRawEstimate]] formula; inclusion–exclusion on a
    * ~13%-error sketch can go NEGATIVE on near-disjoint sets — that's
    * the honest sketch answer and is returned as-is (clamp at the
    * report layer if you must).
    */
  def hllOverlap(state: DataFrame, groupCol: String): DataFrame = {
    val groups = state.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("ga"))
      .crossJoin(groups.select(col(groupCol).as("gb")))
      .where(col("ga") < col("gb"))
    val taggedA = state.join(broadcast(pairs), col(groupCol) === col("ga"))
    val taggedB = state.join(broadcast(pairs), col(groupCol) === col("gb"))
    val unionState = taggedA.unionByName(taggedB)
      .select(col("ga"), col("gb"), col("bucket"), col("max_rho"))
      .groupBy(col("ga"), col("gb"), col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))
    val estU = hllRawEstimate(unionState, Seq("ga", "gb"))
      .select(col("ga"), col("gb"), col("raw_est").as("est_union"))
    val single = hllRawEstimate(state, Seq(groupCol))
    pairs
      .join(broadcast(single.select(col(groupCol).as("ga"),
        col("raw_est").as("est_a"))), Seq("ga"))
      .join(broadcast(single.select(col(groupCol).as("gb"),
        col("raw_est").as("est_b"))), Seq("gb"))
      .join(estU, Seq("ga", "gb"))
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
  }

  /** ROLLING-window distinct counts from daily [[hllState]]s: for each
    * day, the estimate over that day plus the `windowDays − 1` before
    * it — "7-day active users per day" — computed by register-max over
    * a RANGE window on the state table instead of rescanning raw data
    * per window (the q77 rollup argument, applied to sliding windows:
    * a naive per-window COUNT DISTINCT rescans every row windowDays
    * times; this touches each register once per window at
    * 64-registers-per-day grain).
    *
    * `dayCol` must be an integral day ordinal. Days with no rows emit
    * no report row (they have no state); gaps bound correctly because
    * the participation predicate runs on the ordinal.
    *
    * Why a day-JOIN and not a RANGE window over the state: a bucket
    * hit on day d−1 but not on d has no row AT d, so a trailing
    * window over existing rows silently drops it from d's register
    * set. Instead each state row joins to every report day whose
    * window contains it — fan-out ≤ windowDays per register row,
    * state-grain (≤ groups × days × 64), never data-sized.
    */
  def hllRolling(state: DataFrame, groupCols: Seq[String], dayCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 3650, "windowDays in [1, 3650]")
    val days = state.select((groupCols :+ dayCol).map(col): _*).distinct()
    val expanded = state.as("s")
      .join(days.as("d"),
        groupCols.map(c => col(s"s.$c") === col(s"d.$c"))
          .foldLeft((col(s"s.$dayCol") <= col(s"d.$dayCol")) &&
            (col(s"s.$dayCol") > col(s"d.$dayCol") - windowDays))(_ && _))
      .select(groupCols.map(c => col(s"d.$c").as(c)) ++
        Seq(col(s"d.$dayCol").as(dayCol), col("s.bucket"),
          col("s.max_rho")): _*)
      .groupBy((groupCols :+ dayCol :+ "bucket").map(col): _*)
      .agg(max(col("max_rho")).as("max_rho"))
    hllRawEstimate(expanded, groupCols :+ dayCol)
  }

  /** Production estimate = raw with the standard small-range linear
    * counting correction (m·ln(m/V) when registers are empty and the
    * raw estimate is under 2.5m). `ln` is not bit-portable across
    * engines, so this variant is spec-tested for accuracy (SketchesSpec)
    * while the registered query oracles [[hllRawEstimate]].
    */
  def hllEstimate(state: DataFrame, groupCols: Seq[String]): DataFrame =
    hllRawEstimate(state, groupCols)
      .withColumn("est",
        when(col("buckets_hit") < HllBuckets && col("raw_est") <= 2.5 * HllBuckets,
          lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / (lit(HllBuckets) - col("buckets_hit"))))
          .otherwise(col("raw_est")))

  // ------------------------------------------------- histogram quantiles

  /** Histogram state carries its width like [[CmState]]/[[BloomState]]
    * carry their geometry: quantiles read with a different width than
    * the build silently land on wrong boundaries, so the mismatch is
    * made unrepresentable. `buckets` merge across batches by summing.
    */
  final case class HistState(buckets: DataFrame, width: Double) {
    def merge(other: HistState): HistState = {
      require(width == other.width,
        "histogram states merge only at identical width")
      HistState(buckets.unionAll(other.buckets)
        .groupBy(buckets.columns.filter(_ != "cnt").map(col): _*)
        .agg(sum("cnt").as("cnt")), width)
    }
  }

  /** Equi-width histogram state over a numeric column: one row per
    * (group, bucket = floor(value / width)) with its count — the
    * quantile member of the sketch family (exact quantiles need a full
    * sort; this is ONE map-side-combined aggregation whose state is
    * bounded by the value range, not the row count). FIXED boundaries
    * (width is a constant, not data-derived), so states from any two
    * batches merge by summing bucket counts. Null values are DROPPED
    * (they have no bucket, and counting them into n would shift every
    * quantile — and engines disagree on null ordering in the rank
    * walk).
    */
  def histState(df: DataFrame, valueCol: String, width: Double,
                groupCols: Seq[String] = Nil): HistState = {
    require(width > 0, "bucket width must be positive")
    val bucket = floor(col(valueCol) / width).cast("long").as("bucket")
    HistState(
      df.where(col(valueCol).isNotNull)
        .select(groupCols.map(col) :+ bucket: _*)
        .groupBy((groupCols :+ "bucket").map(col): _*)
        .agg(count(lit(1)).as("cnt")),
      width)
  }

  /** Quantile estimates from [[histState]]: for each requested q, the
    * LOWER BOUNDARY of the first bucket whose cumulative count reaches
    * ceil(q·n) — a deterministic integer-rank rule (no interpolation,
    * no floats beyond the final boundary multiply), so an external
    * engine replays the estimate exactly; the error bound is one bucket
    * width. One window pass over the (tiny) state + one aggregation.
    */
  def histQuantiles(state: HistState, qs: Seq[Double],
                    groupCols: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1))
    val labels = qs.map(q => s"p${math.round(q * 100)}")
    require(labels.distinct.size == labels.size,
      s"quantile labels collide after rounding to whole percents: $labels")
    // bucket-grain (cap-bounded sketch state) — a global window here
    // ranks at most `cap` kept buckets per group, never raw rows
    val wOrder =
      if (groupCols.isEmpty) Window.orderBy(col("bucket"))
      else Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
    val wAll =
      if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val cum = state.buckets
      .withColumn("cum", sum(col("cnt")).over(wOrder))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val aggs = qs.zip(labels).map { case (q, label) =>
      // cum is monotone in bucket, so min() picks the first qualifying
      // bucket; its lower boundary is the estimate
      (min(when(col("cum") >= ceil(col("n") * q), col("bucket"))) * state.width).as(label)
    }
    val nAgg = max(col("n")).as("n")
    if (groupCols.isEmpty) cum.agg(nAgg, aggs: _*)
    else cum.groupBy(groupCols.map(col): _*).agg(nAgg, aggs: _*)
  }

  // --------------------------------------- rank-error quantile sketch

  /** Mergeable RANK-ERROR-BOUNDED quantile state over an UNKNOWN value
    * range — the data-adaptive member the fixed-boundary [[histState]]
    * can't be: no width to choose, no boundaries known a priori.
    *
    * Design: deterministic geometric subsampling (the KLL compactor
    * schedule with the coin flips replaced by the repo's
    * content-addressed md5 rule). Every row gets the portable 60-bit
    * hash `h` of its unique key; its MAXIMUM SURVIVABLE LEVEL is
    * `lmax = 60 − bitlen(h)` (integer string-length arithmetic in both
    * engines — no float log anywhere), and the state at level L keeps
    * exactly the rows with `lmax ≥ L` — i.e. `h < 2^(60−L)`, a
    * pseudorandom 2^-L sample. The state's level is the SMALLEST L
    * keeping ≤ cap rows per group. Because membership is a pure
    * function of the row (not of arrival order, partitioning, or merge
    * shape), the state is order-independent, the merge is ASSOCIATIVE
    * with `merge(A,B) = build(A∪B)` exactly, and an external SQL engine
    * replays every kept row — the whole sketch is oracle-auditable,
    * which a coin-flip KLL fundamentally is not.
    *
    * Each kept row at level L stands for 2^L rows, so the estimated
    * rank of the i-th kept value (ties broken by h — both engines sort
    * identically) is `i·2^L`. Rank error: the true rank of that row is
    * a sum of i.i.d. geometric gaps with mean 2^L, so the deviation is
    * O(√i·2^L) ≈ O(n/√cap) with exponential tails — cap 256 gives
    * ~3–6% rank error in practice (exact when n ≤ cap: level 0 keeps
    * everything and the estimator degenerates to nearest-rank).
    * [[histQuantiles]] trades adaptivity for its one-bucket bound; this
    * trades a √cap factor for needing NO prior knowledge of the range.
    *
    * Merge contract: states must come from DISJOINT row sets sharing
    * cap/salt (enforced), with globally unique keys (guarded at build:
    * duplicate keys per group RAISE — a duplicated key would correlate
    * "independent" inclusion decisions and silently bias every rank).
    *
    * 100 TB posture: build is one narrow projection + one
    * map-side-combined (group, lmax) count (≤ 61 rows per group) + one
    * group-sized join to re-filter — two scans, no sort, no data-sized
    * shuffle; the kept state is ≤ ~cap rows per group. Values are
    * caller-scaled longs (the repo's exact-integer rule).
    */
  final case class QuantState(
      cap: Int, salt: String, groupCols: Seq[String],
      items: DataFrame,   // groupCols..., v, h, lmax
      meta: DataFrame) {  // groupCols..., n (exact), level
    def merge(other: QuantState): QuantState = {
      require(cap == other.cap && salt == other.salt &&
        groupCols == other.groupCols,
        "quantile states merge only at identical cap/salt/grouping")
      def joinOn(a: DataFrame, b: DataFrame): DataFrame =
        if (groupCols.isEmpty) a.crossJoin(broadcast(b))
        else a.join(broadcast(b), groupCols)
      val it = items.unionByName(other.items)
      // the union's kept sets are complete only at L ≥ both parts'
      // levels, so the selection floor is the max of the two
      val floorLvl = meta.select((groupCols :+ "level").map(col): _*)
        .unionByName(other.meta.select((groupCols :+ "level").map(col): _*))
        .groupBy(groupCols.map(col): _*)
        .agg(max(col("level")).as("__floor"))
      val lvl = joinOn(pickLevel(it, cap, groupCols), floorLvl)
        .select(groupCols.map(col) :+
          greatest(col("level"), col("__floor")).as("level"): _*)
      val n = meta.select((groupCols :+ "n").map(col): _*)
        .unionByName(other.meta.select((groupCols :+ "n").map(col): _*))
        .groupBy(groupCols.map(col): _*).agg(sum(col("n")).as("n"))
      QuantState(cap, salt, groupCols,
        joinOn(it, lvl).where(col("lmax") >= col("level"))
          .select(it.columns.map(col): _*),
        joinOn(n, lvl))
    }
  }

  /** Smallest level keeping ≤ cap rows per group: cumulative survivor
    * counts from the top level down; L* = 1 + the largest lmax whose
    * cumulative count still exceeds cap (0 if none does).
    */
  private def pickLevel(
      rows: DataFrame, cap: Int, groupCols: Seq[String]): DataFrame = {
    val counts = rows.groupBy((groupCols :+ "lmax").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    // level-grain: one row per (group, lmax) — bounded by the ~60
    // possible halving levels, not by data volume
    val w =
      if (groupCols.isEmpty) Window.orderBy(col("lmax").desc)
      else Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col("lmax").desc)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
    val grouped =
      if (groupCols.isEmpty) cum.groupBy()
      else cum.groupBy(groupCols.map(col): _*)
    grouped.agg(coalesce(
      max(when(col("__cum") > cap, col("lmax") + 1)), lit(0))
      .cast("int").as("level"))
  }

  /** Build [[QuantState]] in one logical pass. `keyCol` must uniquely
    * identify rows within a group (verified — duplicates RAISE);
    * `valueCol` is cast to long (caller-scaled). Null keys/values drop.
    */
  def quantState(df: DataFrame, valueCol: String, keyCol: String,
                 groupCols: Seq[String] = Nil, cap: Int = 256,
                 salt: String = "quant"): QuantState = {
    require(cap >= 16 && cap <= (1 << 20), "cap in [16, 2^20]")
    val rows = df
      .where(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .select(groupCols.map(col) :+
        col(valueCol).cast("long").as("v") :+
        col(keyCol).cast("string").as("__k"): _*)
      .withColumn("h", hash60(col("__k"), salt))
      // bitlen via binary STRING length — exact integer semantics that
      // DuckDB's bin() mirrors; h = 0 (p ≈ 2^-60) lands at 59, same
      // formula both sides
      .withColumn("lmax", (lit(60) - length(bin(col("h")))).cast("int"))
    val meta = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(col("__k")).as("__nd"))
      .withColumn("n", when(col("__nd") === col("n"), col("n"))
        .otherwise(raise_error(lit(s"Sketches.quantState: $keyCol is " +
          "not unique per group — duplicate keys correlate sampling " +
          "decisions and bias every rank; use a true row id")
          .cast("string")).cast("long")))
      .drop("__nd")
    val items = rows.drop("__k")
    val lvl = pickLevel(items, cap, groupCols)
    val (kept, metaLvl) =
      if (groupCols.isEmpty)
        (items.crossJoin(broadcast(lvl)), meta.crossJoin(broadcast(lvl)))
      else
        (items.join(broadcast(lvl), groupCols), meta.join(lvl, groupCols))
    QuantState(cap, salt, groupCols,
      kept.where(col("lmax") >= col("level"))
        .select(items.columns.map(col): _*),
      metaLvl)
  }

  /** ROLLING-window quantiles from per-day [[quantState]]s — the
    * [[hllRolling]] pattern applied to the quantile sketch: for each
    * (group, day), the q-th values over that day plus the
    * `windowDays − 1` before it, computed by WINDOW-MERGING the daily
    * kept sets instead of rescanning raw data per window. Because
    * sketch membership is content-addressed, the window merge is
    * EXACTLY the single-shot build over the window's raw rows (the
    * [[QuantState.merge]] identity, per-window): daily levels lower-
    * bound the window level (floor), survivor counts over the union of
    * daily kept sets are complete at every level ≥ floor, and the
    * minimal qualifying level equals the build's. An external engine
    * therefore replays each window as ONE plain build — no state
    * shipping in the oracle.
    *
    * Cost shape: one [[quantState]] build at (group, day) grain, then
    * every expansion runs at STATE grain — ≤ cap kept rows per
    * (group, day) × windowDays fan-out — never data-sized. Days with
    * no rows emit no report row (the [[hllRolling]] convention).
    */
  def quantRolling(
      df: DataFrame, valueCol: String, keyCol: String,
      groupCols: Seq[String], dayCol: String, windowDays: Int,
      qPpms: Seq[Long], cap: Int = 256,
      salt: String = "quant"): DataFrame = {
    require(windowDays >= 1 && windowDays <= 3650,
      "windowDays in [1, 3650]")
    val st = quantState(df, valueCol, keyCol, groupCols :+ dayCol,
      cap, salt)
    val days = st.meta.select((groupCols :+ dayCol).map(col): _*)
      .distinct()
    def windowJoin(left: DataFrame): DataFrame = {
      val d = days.select(groupCols.map(c => col(c).as(s"__g_$c")) :+
        col(dayCol).as("__rday"): _*)
      val cond = (groupCols.map(c => col(c) <=> col(s"__g_$c")) :+
        (col(dayCol) <= col("__rday")) :+
        (col(dayCol) > col("__rday") - windowDays)).reduce(_ && _)
      groupCols.foldLeft(left.join(broadcast(d), cond))(
        (acc, c) => acc.drop(s"__g_$c")).drop(dayCol)
    }
    val rcols = groupCols :+ "__rday"
    val wMeta = windowJoin(st.meta)
      .groupBy(rcols.map(col): _*)
      .agg(sum(col("n")).as("n"), max(col("level")).as("__floor"))
    val wItems = windowJoin(st.items)
    val lvl = pickLevel(wItems, cap, rcols)
      .join(wMeta, rcols)
      .select((rcols.map(col) :+
        greatest(col("level"), col("__floor")).as("level") :+
        col("n")): _*)
    val kept = wItems.join(broadcast(lvl), rcols)
      .where(col("lmax") >= col("level"))
      .select((rcols.map(col) :+ col("v") :+ col("h") :+
        col("lmax")): _*)
    quantQuantiles(QuantState(cap, salt, rcols, kept, lvl), qPpms)
      .withColumnRenamed("__rday", dayCol)
  }

  /** Quantile readout: for each q (in ppm — exact integer targets), the
    * kept value whose estimated rank `i·2^level` is nearest to
    * `q·(n−1)/1e6`, ties to the smaller estimated rank — pure integer
    * argmin both engines replay digit-for-digit. One explode by |qs|
    * over the cap-bounded state + one argmin window.
    */
  def quantQuantiles(state: QuantState, qPpms: Seq[Long]): DataFrame = {
    require(qPpms.nonEmpty && qPpms.forall(q => q >= 0 && q <= 1000000L),
      "quantile targets are ppm in [0, 1e6]")
    val g = state.groupCols
    // kept-item grain: the state is compaction-capped (≤ cap rows per
    // group), so the readout's global rank never sees raw rows
    val wOrd =
      if (g.isEmpty) Window.orderBy(col("v").asc, col("h").asc)
      else Window.partitionBy(g.map(col): _*)
        .orderBy(col("v").asc, col("h").asc)
    val items = state.items
      .withColumn("__i", row_number().over(wOrd).cast("long") - 1)
    val ranked =
      if (g.isEmpty) items.crossJoin(broadcast(state.meta))
      else items.join(broadcast(state.meta), g)
    // est_rank·1e6 must fit a long: i·2^level ≤ ~2n, so n is capped at
    // 4e12 per group — RAISES past it (the kCore budget-as-contract
    // rule) rather than silently wrapping the argmin
    val guarded = ranked.withColumn("n",
      when(col("n") <= 4000000000000L, col("n")).otherwise(raise_error(
        lit("Sketches.quantQuantiles: group count exceeds 4e12 — the " +
          "ppm argmin would overflow int64; rescale to coarser groups")
        .cast("string")).cast("long")))
    val est = guarded
      .withColumn("q_ppm", explode(typedlit(qPpms.sorted)))
      .withColumn("est_rank", expr("__i * shiftleft(1L, level)"))
      .withColumn("__cost",
        abs(col("est_rank") * 1000000L - col("q_ppm") * (col("n") - 1)))
    val wPick =
      if (g.isEmpty) Window.partitionBy(col("q_ppm"))
        .orderBy(col("__cost").asc, col("est_rank").asc)
      else Window.partitionBy((g.map(col) :+ col("q_ppm")): _*)
        .orderBy(col("__cost").asc, col("est_rank").asc)
    est.withColumn("__r", row_number().over(wPick))
      .where(col("__r") === 1)
      .select((g.map(col) :+ col("q_ppm") :+ col("n") :+ col("level") :+
        col("v").as("value") :+ col("est_rank")): _*)
  }

  // ------------------------------------------------------------- count-min

  /** Count-min state CARRIES its geometry: build and probe sharing
    * (depth, width) is what the one-sided-error contract rests on, so a
    * mismatched probe is unrepresentable rather than a silent wrong
    * answer. `cells` merge across batches by summing per (d, w).
    */
  final case class CmState(cells: DataFrame, depth: Int, width: Int) {
    /** Merge two batches' sketches into the union's sketch. */
    def merge(other: CmState): CmState = {
      require(depth == other.depth && width == other.width,
        "count-min states merge only at identical geometry")
      CmState(cells.unionAll(other.cells)
        .groupBy("d", "w").agg(sum("cnt").as("cnt")), depth, width)
    }
  }

  /** Count-min sketch: one row per non-empty (depth, cell) with its
    * count. depth independent hashes via depth distinct salts; ONE
    * shuffle (map-side combined) onto ≤ depth·width cells — at any
    * corpus size the state is a broadcastable few KB.
    */
  def cmSketch(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 256): CmState = {
    require(depth >= 1 && width >= 1)
    val cells = array((0 until depth).map { i =>
      struct(lit(i).as("d"), (hash60(col(keyCol), i.toString) % width).cast("int").as("w"))
    }: _*)
    CmState(
      df.select(explode(cells).as("cell"))
        .groupBy(col("cell.d").as("d"), col("cell.w").as("w"))
        .agg(count(lit(1)).as("cnt")),
      depth, width)
  }

  /** Point-frequency estimates: min over the probe key's depth cells
    * (never an underestimate; empty cell ⇒ 0 ⇒ key unseen). The sketch
    * side is tiny by construction, so the join broadcasts — probing is
    * a narrow pass over the probe relation at any scale.
    */
  def cmLookup(sketch: CmState, probes: DataFrame, keyCol: String): DataFrame = {
    val cells = array((0 until sketch.depth).map { i =>
      struct(lit(i).as("d"),
        (hash60(col(keyCol), i.toString) % sketch.width).cast("int").as("w"))
    }: _*)
    val probeCols = probes.columns.toSeq
    probes.withColumn("cell", explode(cells))
      .select(probeCols.map(col) :+ col("cell.d").as("d") :+ col("cell.w").as("w"): _*)
      .join(broadcast(sketch.cells), Seq("d", "w"), "left")
      .groupBy(probeCols.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  // ----------------------------------------------------------------- Bloom

  /** Bloom state carries (mBits, k) for the same reason as [[CmState]]:
    * probing with different geometry than the build silently REJECTS
    * true members — the one failure a Bloom pre-filter must never have.
    * `bits` merge across batches by distinct union.
    */
  final case class BloomState(bits: DataFrame, mBits: Int, k: Int) {
    def merge(other: BloomState): BloomState = {
      require(mBits == other.mBits && k == other.k,
        "bloom states merge only at identical geometry")
      BloomState(bits.unionAll(other.bits).distinct(), mBits, k)
    }
  }

  /** Bloom filter as a relation: the DISTINCT set bit positions from k
    * salted hashes per key. ≤ n·k rows (deduplicated, integer) — for a
    * dimension-sized key set this broadcasts, making the membership
    * probe a shuffle-free pre-filter (the classic use: drop the
    * overwhelmingly-absent keys BEFORE an expensive join or dedup pass;
    * no false negatives, so nothing real is ever dropped).
    */
  def bloomBits(df: DataFrame, keyCol: String, mBits: Int = 16384, k: Int = 3): BloomState = {
    require(mBits >= 1 && k >= 1)
    val bits = array((0 until k).map(i => (hash60(col(keyCol), i.toString) % mBits).cast("int")): _*)
    BloomState(df.select(explode(bits).as("bit")).distinct(), mBits, k)
  }

  /** Bloom-PRUNE a fact table before an expensive join: keep only the
    * rows whose key "may be present" in the bloom — the runtime-filter
    * pattern (Spark's own AQE `InjectRuntimeFilter` does this
    * opportunistically; this operator is the explicit, guaranteed
    * form for when the dim side is known-selective, e.g. "join 100 TB
    * of lineitems to the 400 suppliers of one nation").
    *
    * Unlike [[bloomProbe]] (which re-aggregates to carry a flag), this
    * stays a pure FILTER at the fact table's own grain: k broadcast
    * LEFT-SEMI joins, one per hash — each is a shuffle-free
    * BroadcastHashJoin, so at 100 TB the fact side is pruned inside
    * its scan stage and the expensive downstream shuffle only ever
    * sees surviving rows. No false negatives (nothing real is
    * dropped); false positives are eliminated by the exact join that
    * follows, so `exact_join(bloomPrune(fact), dim) ≡
    * exact_join(fact, dim)` — the equivalence the q135 oracle checks.
    * NULL keys never match a bloom (hash of null is null → semi-join
    * drops them), matching equi-join semantics exactly.
    */
  def bloomPrune(bloom: BloomState, fact: DataFrame, keyCol: String): DataFrame =
    (0 until bloom.k).foldLeft(fact) { (d, i) =>
      d.join(broadcast(bloom.bits),
        (hash60(col(keyCol), i.toString) % bloom.mBits).cast("int") === col("bit"),
        "left_semi")
    }

  /** Probe: a key "may be present" iff ALL k of its bits are set.
    * Left-join against the broadcast bit relation + count == k; carries
    * every probe column through.
    */
  def bloomProbe(bloom: BloomState, probes: DataFrame, keyCol: String): DataFrame = {
    val pb = array((0 until bloom.k).map(i =>
      (hash60(col(keyCol), i.toString) % bloom.mBits).cast("int")): _*)
    val probeCols = probes.columns.toSeq
    probes.withColumn("bit", explode(pb))
      .join(broadcast(bloom.bits.withColumn("hit", lit(1))), Seq("bit"), "left")
      .groupBy(probeCols.map(col): _*)
      .agg((sum(coalesce(col("hit"), lit(0))) === bloom.k).as("maybe_member"))
  }
}
