package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data assembly (SURVEY §3.3
  * family): a row is kept iff a STABLE content-independent hash of its
  * id falls under the stratum's rate — no RNG state, so the sample is
  * reproducible across runs, engines, and partitionings (`df.sample` is
  * none of those: its Bernoulli draw depends on partition layout), and
  * it composes with incremental ingest (a doc's verdict never changes
  * as the corpus around it grows).
  *
  * The hash is the first 60 bits of md5(id) — a standard digest any
  * engine computes identically (the q19/q14 portable-hash technique),
  * which is what makes the sample externally auditable: the DuckDB
  * oracle replays it bit-for-bit.
  *
  * 100 TB posture: one narrow codegen'd filter — no shuffle, no state;
  * rates multiply correctly under repeated application with distinct
  * salts.
  */
object Sampling {

  /** Uniform bucket in [0, 100) from the shared portable hash
    * ([[graft.functions.PortableHash.hash60]] — one definition so the
    * DuckDB replays can never drift between operators; salts must not
    * contain chr(1)).
    */
  def hashBucket(id: Column, salt: String = ""): Column =
    (graft.functions.PortableHash.hash60(id, salt) % 100).cast("int")

  /** Keep rows whose hash bucket < `pct` (≈ pct% deterministic sample). */
  def hashSample(df: DataFrame, idCol: String, pct: Int, salt: String = ""): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct in [0, 100]")
    df.where(hashBucket(col(idCol), salt) < pct)
  }

  /** Per-stratum rates — the real training-mix shape (downsample the
    * dominant stratum, keep the rare ones): rows in a stratum absent
    * from `rates` fall back to `defaultPct`.
    */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Int],
      defaultPct: Int = 100,
      salt: String = ""): DataFrame = {
    require((defaultPct +: rates.values.toSeq).forall(p => p >= 0 && p <= 100))
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, p).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), salt) < rate)
  }
}
