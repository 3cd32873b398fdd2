package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition a real LLM
  * data pipeline runs as ONE job (SURVEY §3.3 capstone shape, the text
  * twin of [[Dedup.deduplicate]]):
  *
  *   1. gate: drop null texts, docs under `minTokens`, below
  *      `minQuality`, or with no identifiable language — each signal is
  *      an existing single-scan kernel ([[TextFunctions]]), so the whole
  *      gate stays inside one narrow codegen'd projection;
  *   2. exact dedup: canonical survivor (lowest id) per content
  *      fingerprint — one shuffle ([[Dedup.exact]] on
  *      [[TextFunctions.fingerprint]]), which collapses the re-crawled
  *      byte-identical mass BEFORE any expensive near-dup pass;
  *   3. emit the surviving docs with their gating metadata
  *      (`n_tokens`, `quality`, `lang_guess`, `fp`) so downstream
  *      stages (near-dup LSH, token budgeting, per-language sampling)
  *      reuse the already-computed signals instead of re-scanning.
  *
  * 100 TB posture: one scan + one fingerprint-keyed shuffle, nothing
  * driver-sized; the gate prunes before the shuffle so the exchange
  * carries only admissible docs.
  */
object CorpusPrep {

  def clean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Long = 10L,
      minQuality: Double = 0.3): DataFrame = {
    val txt = col(textCol)
    val gated = df
      .where(txt.isNotNull)
      .withColumn("n_tokens", TextFunctions.tokenCount(txt))
      .withColumn("quality", TextFunctions.qualityScore(txt))
      .withColumn("lang_guess", TextFunctions.langId(txt))
      .where(col("n_tokens") >= minTokens &&
        col("quality") >= minQuality && col("lang_guess") =!= "und")
      .withColumn("fp", TextFunctions.fingerprint(txt))
    Dedup.exact(gated, Seq(col("fp")), col(idCol))
  }

  /** Token-budget packing — fill a per-stratum training mix: within each
    * stratum take documents in (priority DESC, id ASC) order while the
    * RUNNING token total stays ≤ `budget`. With `admitFirst` the
    * stratum's first doc is admitted even when it alone exceeds the
    * budget — otherwise a stratum whose best doc is oversized packs to
    * EMPTY (the strict reading, and the default). One window pass:
    * cumulative sum over the stratum ordering, filter on the inclusive
    * prefix total — no iteration, no driver state, deterministic for a
    * deterministic ordering.
    */
  def packByBudget(
      df: DataFrame,
      strataCol: String,
      priorityCol: String,
      idCol: String,
      tokenCol: String,
      budget: Long,
      admitFirst: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col(priorityCol).desc, col(idCol).asc)
    val cum = sum(col(tokenCol)).over(w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
    val keep =
      if (admitFirst) cum <= budget || row_number().over(w) === 1
      else cum <= budget
    df.withColumn("__keep", keep)
      .where(col("__keep"))
      .drop("__keep")
  }
}
