package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed build keys — the explicit form of the
  * skew mitigation AQE applies heuristically (SURVEY §3.3 "100 TB
  * posture"). Use when one join key dominates (a hot user, an empty
  * string, a default id): a plain hash join sends the whole hot key to
  * ONE reducer; salting fans each hot key out over `numSalts` reducers.
  *
  * Shape: the large (probe) side gets a deterministic per-row salt in
  * [0, numSalts); the smaller (build) side is replicated once per salt
  * value; the join key becomes (key, salt). Result set is EXACTLY the
  * plain join's (every probe row still meets every matching build row —
  * under the salt its row carries, against the build copy with that
  * salt), so the plain join is the oracle.
  *
  * Cost model: build side shuffles numSalts× its size — worth it iff
  * the hot-key reducer is the critical path. Use for build sides far
  * too big to broadcast but far smaller than the probe (dimension-scale,
  * not fact-scale); for broadcastable builds just broadcast, and for
  * mild skew let AQE's skewJoin split oversized partitions instead.
  */
object SkewJoin {

  /** Inner equi-join of `probe` and `build` on `keys`, salted
    * `numSalts` ways. By default the salt is xxhash64 of the probe row
    * (all columns): deterministic for a given row — re-runs and task
    * retries see the same salt — and uniform over DISTINCT hot-key rows.
    * Caveat: byte-identical duplicate probe rows all hash to the same
    * salt, so a hot key whose rows are exact copies (an empty-string or
    * default-id key with no distinguishing payload) is NOT spread. For
    * that shape pass `rowUniqueSalt = true`: the salt then mixes in
    * `monotonically_increasing_id()`, which spreads even identical rows
    * but is only stable for a fixed partitioning of the probe input
    * (a lost-partition recompute may re-salt its rows — harmless here,
    * since any salt value meets the same replicated build rows, but not
    * byte-reproducible across retries).
    */
  def saltedInnerJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      numSalts: Int = 16,
      rowUniqueSalt: Boolean = false): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val saltSrc =
      if (rowUniqueSalt) xxhash64(monotonically_increasing_id())
      else xxhash64(probe.columns.map(col).toIndexedSeq: _*)
    val saltedProbe = probe.withColumn("__salt", pmod(saltSrc, lit(numSalts)))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    saltedProbe.join(saltedBuild, keys :+ "__salt").drop("__salt")
  }
}
