package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture between corpus snapshots, and SCD2 history
  * construction from a change log — the bookkeeping layer of a living
  * training corpus: "what changed since the last release?" feeds the
  * incremental dedup/index-append path (q54/q84) instead of a full
  * rebuild, and attribute history ("which license did this doc carry
  * in March?") is what makes a release auditable.
  *
  * Reference scope: the upstream k-modes library has no snapshot
  * story; this is north-star surface (SURVEY §3.3) like the rest of
  * the pipeline family.
  *
  * 100 TB design notes:
  *  - [[snapshotDiff]] hashes the compared payload to ONE 32-byte
  *    column per side BEFORE the join, so the full-outer shuffle
  *    carries keys + a signature, never wide documents. At 100 TB the
  *    text column dominates row width ~1000:1 — pre-hashing turns an
  *    unshufflable join into a routine one. Callers hydrate changed
  *    keys against the snapshots afterwards (the diff is output-bound:
  *    unchanged rows — the overwhelming majority between releases —
  *    are dropped inside the join stage, never materialized).
  *  - The signature is the portable md5 recipe (null sentinel ␂,
  *    field joiner ␁ — same aliasing argument as
  *    [[graft.functions.PortableHash]]), so external engines can
  *    replay it; the SEMANTIC contract is column-wise
  *    `IS DISTINCT FROM`, which the oracle replays directly —
  *    the hash is an implementation detail the spec pins equal.
  *  - [[scd2]] is one shuffle: both window passes (no-op-change
  *    suppression, then validity intervals) partition by the same
  *    key, so Catalyst plans a single exchange and two in-order
  *    WindowExecs over it. Per-key state is a sort run (spills, never
  *    OOMs), same argument as [[Sessionize]].
  */
object ChangeCapture {

  /** Portable payload signature: md5 over ␁-joined, ␂-null-sentineled
    * string casts of `cols` — replayable as
    * `md5(concat_ws(chr(1), COALESCE(CAST(c AS VARCHAR), chr(2)), …))`.
    */
  def paySig(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001", cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*))

  /** Row-level diff of two snapshots of the same keyed table: one row
    * per key whose state changed, `op ∈ {insert, update, delete}`.
    * Unchanged keys (same values in `compareCols` under null-safe
    * equality) are dropped. Keys must be unique per snapshot (the
    * join would otherwise fan out; validate upstream with
    * [[Quality]]-style uniqueness checks).
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compare column")
    def sig(df: DataFrame, side: String) = df.select(
      keyCols.map(col) :+ paySig(compareCols.map(col)).as(s"__sig_$side"): _*)
    val o = sig(oldSnap, "old")
    val n = sig(newSnap, "new")
    val joined = o.join(n, keyCols, "full_outer")
    joined
      .withColumn("op",
        when(col("__sig_old").isNull, lit("insert"))
          .when(col("__sig_new").isNull, lit("delete"))
          .when(col("__sig_old") =!= col("__sig_new"), lit("update")))
      .where(col("op").isNotNull)
      .select(keyCols.map(col) :+ col("op"): _*)
  }

  /** Slowly-changing-dimension type-2 history from a change log: for
    * each key, collapse consecutive log entries with identical
    * `attrCols` (no-op changes), then emit one validity interval per
    * surviving state — `valid_from` = its first log timestamp,
    * `valid_to` = the next state's timestamp (null = current state).
    * `tieCol` breaks equal timestamps deterministically.
    */
  def scd2(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(attrCols.nonEmpty, "need at least one attribute column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val sig = paySig(attrCols.map(col))
    changes
      .select((keyCols ++ Seq(tsCol, tieCol) ++ attrCols).map(col): _*)
      .withColumn("__sig", sig)
      .withColumn("__prev", lag(col("__sig"), 1).over(w))
      // null-safe: a null-attribute state following a null-attribute
      // state is still a no-op (<=> instead of =)
      .where(!(col("__sig") <=> col("__prev")))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to")): _*)
  }

  /** POINT-IN-TIME join of facts against an SCD2 history — the
    * feature-store lookup that makes training data temporally honest:
    * each fact row is decorated with the dimension attributes that
    * were valid AT THE FACT'S OWN TIMESTAMP (`valid_from ≤ ts <
    * valid_to`), never with today's values (training on current
    * attributes for past events is silent target leakage — the exact
    * failure [[graft.operators.Sampling.walkForwardFolds]] guards the
    * split axis against, here applied to the feature axis).
    *
    * Plan — the [[AsOfJoin]] union trick, ONE shuffle: dimension
    * versions and facts union-tag into one stream keyed by
    * (key, t = valid_from | ts); a per-key window carries the LAST
    * version at-or-before each row downward (dim sorts before facts at
    * equal t, so a version starting exactly at ts applies); a final
    * narrow filter voids carried versions whose `valid_to` the fact
    * has passed (matters for gapped histories; contiguous scd2 output
    * only hits it before the first version). No join node at all —
    * at 100 TB this is one exchange of facts+versions vs the
    * alternative's range-join fan-out.
    *
    * Assumes one version per (key, valid_from) — [[scd2]] guarantees
    * it by construction.
    *
    * @return every fact row + the dim `attrCols` (null where no
    *         version covers the fact's instant)
    */
  def pointInTime(
      facts: DataFrame,
      dim: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    val factCols = facts.columns.toSeq
    val ver = struct(attrCols.map(col) :+ col("valid_to").as("__vto"): _*)
    val d = dim.select(Seq(col(keyCol).as("__k"),
        col("valid_from").as("__t"), lit(0).as("__side"),
        ver.as("__ver")) ++
        factCols.map(c => lit(null).cast(facts.schema(c).dataType.sql).as(c)): _*)
    val f = facts.select(Seq(col(keyCol).as("__k"), col(tsCol).as("__t"),
        lit(1).as("__side"), lit(null).cast(d.schema("__ver").dataType.sql)
          .as("__ver")) ++ factCols.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = d.unionByName(f)
      .withColumn("__cur", last(col("__ver"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val alive = col("__cur").isNotNull &&
      (col("__cur.__vto").isNull || col("__cur.__vto") > col("__t"))
    carried.select(factCols.map(col) ++
      attrCols.map(a => when(alive, col(s"__cur.$a")).as(a)): _*)
  }

  /** Apply a CDC change log onto a snapshot — the MERGE/upsert that
    * turns "yesterday's table + today's deltas" into today's table
    * without rewriting unchanged rows' provenance: per key the LATEST
    * change by (ts, tie) wins (out-of-order deliveries collapse
    * deterministically — the tie column makes "same timestamp twice"
    * a total order, not a coin flip); op `U` upserts the carried
    * attributes, op `D` deletes the key, any other winning op RAISES;
    * keys the log never mentions pass through unchanged.
    *
    * 100 TB shape: one window pass over the (delta-sized, not
    * snapshot-sized) change log picks each key's verdict; ONE
    * full-outer equi-join applies verdicts to the snapshot — AQE
    * broadcasts the verdict side when the day's delta is small, the
    * common case. Snapshot keys are assumed unique (validate with the
    * [[Quality]] gate).
    *
    * Incremental use (foreachBatch maintenance of a living snapshot):
    * applying batches SEQUENTIALLY equals the one-shot merge when the
    * log is (ts, tie)-ordered across batches — the normal shape of a
    * CDC stream (StreamOpsSpec pins the parity). If changes can
    * arrive out of order ACROSS batch boundaries, carry ts/tie inside
    * `attrCols` and guard the apply with an only-if-newer filter —
    * within one batch the window already handles reordering.
    *
    * @param changes (keyCol, tsCol, tieCol, opCol ∈ {U, D}, attrCols)
    * @return the merged snapshot: keyCol ++ attrCols
    */
  def applyCdc(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      opCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    // validate the op INSIDE the projected verdict column so the check
    // rides the applied path and cannot be pruned; a malformed op that
    // LOSES its key's race is superseded by definition and does not
    // raise (same stance as a late-arriving duplicate)
    val opChecked = when(col(opCol) === "U" || col(opCol) === "D", col(opCol))
      .otherwise(raise_error(concat(
        lit("ChangeCapture.applyCdc: unknown op '"),
        coalesce(col(opCol).cast("string"), lit("null")),
        lit("' — a malformed change must not silently pass through")))
        .cast("string"))
    val verdict = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(Seq(col(keyCol).as("__k"), opChecked.as("__op")) ++
        attrCols.map(a => col(a).as(s"__c_$a")): _*)
    snapshot.join(verdict, col(keyCol) === col("__k"), "full_outer")
      .where(col("__op").isNull || col("__op") === "U")
      .select(coalesce(col(keyCol), col("__k")).as(keyCol) +:
        attrCols.map(a =>
          when(col("__op") === "U", col(s"__c_$a")).otherwise(col(a)).as(a)): _*)
  }

  /** Incremental aggregate maintenance — the per-group (Δrows, Δsum)
    * a CDC batch contributes to a MAINTAINED aggregate, so the 100 TB
    * rollup is updated from the delta alone and the base table is
    * never rescanned. Pairs with [[applyAggDelta]]; the correctness
    * contract is `applyAggDelta(agg(base), delta) ≡ agg(applyCdc(base,
    * changes))` — group moves, value changes, deletes of absent keys
    * and all out-of-order deliveries included (spec-pinned).
    *
    * Shape: the change log collapses to per-key verdicts with the SAME
    * (ts desc, tie desc) window + op validation as [[applyCdc]] (one
    * source of truth for "who wins"); changed keys' OLD rows hydrate
    * via one equi-join against the base (delta-sized output — on a
    * key-bucketed base table this is a pruned lookup, the point of the
    * operator) and contribute (−1, −value) at their old group; winning
    * `U` verdicts contribute (+1, +value) at their new group. One
    * map-side-combined groupBy over a 2×delta-sized union.
    *
    * Contract: base keys unique; `valueCol` non-null exact integers
    * (cents/e4-scaled longs — float sums would be order-dependent).
    *
    * @return (groupCol, d_rows, d_sum) — BIGINT deltas, possibly
    *         negative, groups untouched by the batch absent
    */
  def incrementalAggDelta(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      opCol: String,
      groupCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val opChecked = when(col(opCol) === "U" || col(opCol) === "D", col(opCol))
      .otherwise(raise_error(concat(
        lit("ChangeCapture.incrementalAggDelta: unknown op '"),
        coalesce(col(opCol).cast("string"), lit("null")), lit("'")))
        .cast("string"))
    val verdict = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(keyCol).as("__k"), opChecked.as("__op"),
        col(groupCol).as("__g"), col(valueCol).as("__v"))
    // OLD contribution: every verdict key that exists in base vacates
    // its current row (U moves it, D removes it)
    val removed = base
      .select(col(keyCol).as("__k"), col(groupCol).as("__g"),
        col(valueCol).as("__v"))
      .join(verdict.select(col("__k"), col("__op")), Seq("__k"))
      .select(col("__g"), lit(-1L).as("__dr"), (-col("__v")).as("__dv"))
    val added = verdict.where(col("__op") === "U")
      .select(col("__g"), lit(1L).as("__dr"), col("__v").cast("long").as("__dv"))
    removed.unionByName(added)
      .groupBy(col("__g").as(groupCol))
      .agg(sum(col("__dr")).as("d_rows"), sum(col("__dv")).as("d_sum"))
      .select(col(groupCol), col("d_rows"), col("d_sum"))
  }

  /** Merge an [[incrementalAggDelta]] onto the maintained aggregate.
    * `baseAgg` carries (groupCol, n_rows, sum_val); groups whose row
    * count reaches zero are DROPPED (a full recompute would not emit
    * them). Null is a group like any other (null-safe join).
    */
  def applyAggDelta(
      baseAgg: DataFrame,
      delta: DataFrame,
      groupCol: String): DataFrame = {
    val b = baseAgg.select(col(groupCol).as("__bg"), col("n_rows"),
      col("sum_val"))
    val d = delta.select(col(groupCol).as("__dg"), col("d_rows"),
      col("d_sum"))
    b.join(d, col("__bg") <=> col("__dg"), "full_outer")
      .select(coalesce(col("__bg"), col("__dg")).as(groupCol),
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("d_rows"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) +
          coalesce(col("d_sum"), lit(0L))).as("sum_val"))
      .where(col("n_rows") > 0)
  }
}
