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
private[graft] trait QueriesDedup { this: Queries.type =>
  // ------------------------------------------------------------------- dedup
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        Seq(col("o_custkey")), col("o_orderkey"))
      .orderBy("o_orderkey")

  val dedupExactSql: String =
    """SELECT o_orderkey, o_custkey FROM (
      |  SELECT o_orderkey, o_custkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS rn
      |  FROM orders
      |) WHERE rn = 1 ORDER BY o_orderkey""".stripMargin

  /** DuckDB token + 3-shingle expressions shared by the text oracles. */
  private[graft] val duckToks =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)"""
  private[graft] val duckShingles =
    """list_distinct([array_to_string(toks[i:i+2], ' ')
      |    for i in range(1, greatest(len(toks) - 2, 1) + 1)])""".stripMargin

  def dedupFingerprint(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(
        t(s, dir, "documents")
          .where(col("text").isNotNull) // null docs never dedup (LSH-family semantics)
          .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp")),
        Seq(col("fp")), col("doc_id"))
      .select(col("doc_id"), col("fp"))
      .orderBy("doc_id")

  val dedupFingerprintSql: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    md5(array_to_string(list_sort(list_distinct($duckToks)), ' ')) AS fp
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id, fp FROM (
       |  SELECT doc_id, fp, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
       |  FROM f
       |) WHERE rn = 1 ORDER BY doc_id""".stripMargin

  private[graft] def allPairsJaccardSql(threshold: Double): String =
    s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |sh AS (SELECT doc_id, $duckShingles AS sh FROM tok),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |          len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** MinHash+LSH near-dup pairs. Oracle: exact all-pairs Jaccard — valid
    * because on this corpus every >=0.7 pair is >=0.9 and the seeded LSH
    * deterministically recalls them all (verified offline; miss prob
    * ~3e-8 per pair at 16 bands × 4 rows).
    */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLSH(t(s, dir, "documents"), "doc_id", "text", threshold = 0.7)
      .orderBy("id_a", "id_b")

  val dedupMinhashSql: String = allPairsJaccardSql(0.7)

  def dedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
      .orderBy("id_a", "id_b")

  val dedupNgramSql: String = allPairsJaccardSql(0.5)

  /** Near-dup GROUPS: connected components (smallest-id labels) over the
    * MinHash-LSH pair list. Oracle: DuckDB recursive CTE computing the
    * same min-reachable-id over the exact all-pairs >= 0.7 edge set.
    */
  def dedupGroups(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
        Dedup.minhashLSH(t(s, dir, "documents"), "doc_id", "text", threshold = 0.7))
      .orderBy("id")

  /** Shared recursive-CTE prefix computing (id, group_id) component
    * labels over the exact all-pairs >= 0.7 edge set — the single
    * source of truth for the q35 and q52 oracles.
    */
  private[graft] def componentLabelsSqlPrefix: String = {
    val pairs = allPairsJaccardSql(0.7)
      .replace("ORDER BY id_a, id_b", "")
    s"""WITH RECURSIVE pairs AS ($pairs),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach(v, u) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT reach.v, e.dst FROM reach JOIN edges e ON e.src = reach.u),
       |labels AS (SELECT v AS id, min(u) AS group_id FROM reach GROUP BY v)""".stripMargin
  }

  val dedupGroupsSql: String =
    s"""$componentLabelsSqlPrefix
       |SELECT id, group_id FROM labels ORDER BY id""".stripMargin

  /** The capstone dedup operation: the corpus with near-duplicates
    * REMOVED (canonical member per group survives). Oracle: the q35
    * recursive-CTE component labels, anti-joined the same way.
    */
  def dedupCorpus(s: SparkSession, dir: String): DataFrame =
    Dedup.deduplicate(t(s, dir, "documents"), "doc_id", "text", threshold = 0.7)
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")

  val dedupCorpusSql: String =
    s"""$componentLabelsSqlPrefix
       |SELECT doc_id, n_chars FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM labels WHERE id <> group_id)
       |ORDER BY doc_id""".stripMargin

  /** Replayable 60-bit token hash: int(md5(token)[0:15], 16). Both
    * engines compute the identical value (Spark conv / DuckDB hex cast),
    * so a pipeline built on it — unlike one on Spark-private xxhash64 —
    * can be reproduced bit-for-bit by the oracle. 15 hex digits = 60
    * bits keeps the value positive in a signed BIGINT on both sides.
    */
  private[graft] def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** SimHash near-dup pairs, oracled EXACTLY: the registered query runs
    * the simhash pipeline on the replayable [[md5Hash60]] token hash
    * (the operator's default stays codegen'd xxhash64), and the oracle
    * recomputes the identical simhashes in DuckDB and takes ALL PAIRS at
    * Hamming <= 3. All-pairs is not an approximation of the blocked
    * pipeline here — the 4×16-bit pigeonhole blocking is lossless for
    * maxDist <= 3 (any pair within distance 3 shares an exact block), so
    * blocked and all-pairs answers are equal by construction; everything
    * downstream of the hash is exact integer math (bit votes, xor,
    * bit_count). Bucket-cap divergence is impossible at the verify SF
    * (a 16-bit block bucket would need >1000 colliding docs out of 500).
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxDist = 3,
        tokenHash = md5Hash60)
      .orderBy("id_a", "id_b")

  val dedupSimhashSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($duckToks) AS t FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT)::BIGINT AS h
       |  FROM tok),
       |bits AS (
       |  -- range(60), not 64: the hash is 60-bit by construction, so
       |  -- bits 60-63 never set (and 1::BIGINT << 63 would overflow)
       |  SELECT doc_id, b.bit,
       |    SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM th CROSS JOIN (SELECT unnest(range(60)) AS bit) b
       |  GROUP BY doc_id, b.bit),
       |sim AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN vote > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS sim
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
}
