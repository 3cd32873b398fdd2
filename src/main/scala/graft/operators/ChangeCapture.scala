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
}
