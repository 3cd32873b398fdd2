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
private[graft] trait QueriesSketches { this: Queries.type =>
  // ---------------------------------------------------------------- sketches
  /** DuckDB twin of [[Sketches.hash60]] — salt ␁ key, first 60 md5 bits. */
  private[graft] def duckHash60(salt: String, e: String): String =
    s"CAST(CAST(concat('0x', substr(md5(concat_ws(chr(1), '$salt', CAST($e AS VARCHAR))), 1, 15)) AS UBIGINT) AS BIGINT)"

  /** DuckDB twin of [[Sketches]]' rho: 1 + leading zeros of the 54
    * post-bucket bits, capped at 40 — ONE source of truth for every
    * HLL oracle (q61, q77); a drift between copies would silently
    * stale one oracle. `h` must be a [[duckHash60]] expression.
    */
  private[graft] def duckHllRho(h: String): String =
    s"""LEAST(CASE WHEN $h // 64 = 0 THEN 55
       |           ELSE 55 - length(bin($h // 64)) END, 40)""".stripMargin

  /** DuckDB twin of [[Sketches.hllRawEstimate]]'s formula over a
    * (bucket, max_rho) relation: alpha_64 · m² / Σ 2^-rho with empty
    * registers contributing 2^0. */
  private[graft] def duckHllEstimate: String =
    "(0.709 * 4096.0) / (SUM(power(2.0, -max_rho)) + (64 - COUNT(*)))"

  /** HyperLogLog distinct order keys per return flag
    * ([[Sketches.hllState]] over lineitem, ~11k distinct keys per
    * group): the mergeable one-pass sketch a 100 TB profiler uses
    * instead of repeated exact COUNT(DISTINCT) shuffles. The registered
    * output carries the integer state summary plus the RAW estimate
    * (the ln-based small-range correction is spec-tested, not oracled —
    * `ln` is not bit-portable across engines); the exact count rides
    * along as the honesty column. The estimate column is bit-exact
    * across engines by the [[Sketches.HllRhoCap]] argument, then
    * floor-truncated per the repo float rule.
    */
  def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_orderkey"))
    val est = Sketches.hllRawEstimate(
      Sketches.hllState(li, "l_orderkey", Seq("l_returnflag")), Seq("l_returnflag"))
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact_keys"))
    exact.join(est, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_keys"), col("buckets_hit"),
        (floor(col("raw_est") * 1e4) / 1e4).as("hll_raw_est"))
      .orderBy("l_returnflag")
  }

  val hllDistinctSql: String = {
    val h = duckHash60("", "l_orderkey")
    s"""WITH b AS (
       |  SELECT l_returnflag, $h % 64 AS bucket,
       |    ${duckHllRho(h)} AS rho
       |  FROM lineitem),
       |st AS (
       |  SELECT l_returnflag, bucket, MAX(rho) AS max_rho FROM b GROUP BY 1, 2),
       |e AS (
       |  SELECT l_returnflag, CAST(COUNT(*) AS INT) AS buckets_hit,
       |    $duckHllEstimate AS raw_est
       |  FROM st GROUP BY 1),
       |x AS (
       |  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_keys
       |  FROM lineitem GROUP BY 1)
       |SELECT x.l_returnflag, x.exact_keys, e.buckets_hit,
       |  floor(e.raw_est * 1e4) / 1e4 AS hll_raw_est
       |FROM x JOIN e USING (l_returnflag) ORDER BY l_returnflag""".stripMargin
  }

  /** Count-min frequency sketch ([[Sketches.cmSketch]]): build 4×128
    * integer cells over event user_ids in one map-side-combined pass,
    * then probe the 5 exactly-heaviest users through the broadcast
    * sketch. The width is sized so the sketch HONESTLY collides on this
    * fixture (2 of the 5 probes overestimate — the q55 honest-config
    * principle); cm_est ≥ exact always (one-sided error) and the oracle
    * replays every cell and the min-over-rows lookup exactly.
    */
  def cmHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"))
    val sketch = Sketches.cmSketch(ev, "user_id", depth = 4, width = 128)
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id").asc).limit(5)
    Sketches.cmLookup(sketch, top, "user_id")
      .select(col("user_id"), col("exact_cnt"), col("cm_est"))
      .orderBy("user_id")
  }

  val cmHeavyHittersSql: String = {
    def cell(i: Int) = s"${duckHash60(i.toString, "user_id")} % 128"
    val probeCells = (0 until 4).map(i => s"SELECT user_id, exact_cnt, $i AS d, ${cell(i)} AS w FROM top")
      .mkString("\n  UNION ALL ")
    val buildCells = (0 until 4).map(i => s"SELECT $i AS d, ${cell(i)} AS w FROM events")
      .mkString("\n  UNION ALL ")
    s"""WITH cells AS (
       |  SELECT d, w, COUNT(*) AS cnt FROM (
       |  $buildCells) GROUP BY d, w),
       |top AS (
       |  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY 1
       |  ORDER BY exact_cnt DESC, user_id ASC LIMIT 5),
       |pc AS (
       |  $probeCells)
       |SELECT pc.user_id, pc.exact_cnt,
       |  MIN(COALESCE(c.cnt, 0)) AS cm_est
       |FROM pc LEFT JOIN cells c USING (d, w)
       |GROUP BY 1, 2 ORDER BY user_id""".stripMargin
  }

  /** Bloom-filter membership pre-filter ([[Sketches.bloomBits]]): bits
    * built over customer keys (16384 bits / 3 hashes, a few-KB
    * broadcast relation), probed by order custkeys (all true members —
    * no false negatives, the property that makes Bloom a safe join
    * pre-filter) and by a shifted non-member cohort whose positives
    * expose the honest false-positive count. Integer-exact, fully
    * replayed by the oracle.
    */
  def bloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val bits = Sketches.bloomBits(
      t(s, dir, "customer").select(col("c_custkey")), "c_custkey")
    val ordKeys = t(s, dir, "orders").select(col("o_custkey")).distinct()
    val probes = ordKeys.select(col("o_custkey").as("key"), lit("member").as("cohort"))
      .unionAll(ordKeys.select((col("o_custkey") + 1000000L).as("key"), lit("shifted").as("cohort")))
    Sketches.bloomProbe(bits, probes, "key")
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("maybe_member"), 1L).otherwise(0L)).as("n_positive"))
      .orderBy("cohort")
  }

  val bloomPrefilterSql: String = {
    def bit(i: Int, e: String) = s"${duckHash60(i.toString, e)} % 16384"
    val buildBits = (0 until 3).map(i => s"SELECT ${bit(i, "c_custkey")} AS bit FROM customer")
      .mkString("\n  UNION ")
    val probeBits = (0 until 3).map(i => s"SELECT key, cohort, ${bit(i, "key")} AS bit FROM probes")
      .mkString("\n  UNION ALL ")
    s"""WITH bits AS (
       |  $buildBits),
       |probes AS (
       |  SELECT DISTINCT o_custkey AS key, 'member' AS cohort FROM orders
       |  UNION ALL
       |  SELECT DISTINCT o_custkey + 1000000 AS key, 'shifted' AS cohort FROM orders),
       |pb AS (
       |  $probeBits),
       |mem AS (
       |  SELECT pb.key, pb.cohort,
       |    (COUNT(b.bit) = 3) AS maybe
       |  FROM pb LEFT JOIN bits b USING (bit) GROUP BY 1, 2)
       |SELECT cohort, COUNT(*) AS n_probes,
       |  CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
       |FROM mem GROUP BY cohort ORDER BY cohort""".stripMargin
  }

  /** q238: rolling 7-day p50/p99 event values per type
    * ([[Sketches.quantRolling]]) — the quantile sibling of q131's HLL
    * rolling distinct: per (event_type, day), the window's quantiles
    * from WINDOW-MERGED daily sketch states (state-grain day-join, no
    * raw rescan per window). Because the window merge provably equals
    * the single-shot build over the window's rows, the oracle replays
    * each window as one plain build — the identity IS the check.
    */
  def quantRollingEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"),
      expr("ts div 86400000000000").as("day"),
      floor(col("value") * 1000).cast("long").as("mills"),
      col("event_id").as("rid"))
    Sketches.quantRolling(ev, "mills", "rid", Seq("event_type"), "day",
        windowDays = 7, qPpms = Seq(500000L, 990000L), cap = 128,
        salt = "quantr")
      .orderBy("event_type", "day", "q_ppm")
  }

  val quantRollingEventsSql: String =
    s"""WITH ev AS (SELECT event_type AS g,
       |    epoch_ns(ts) // 86400000000000 AS day,
       |    CAST(FLOOR(value * 1000) AS BIGINT) AS v,
       |    ${duckHash60("quantr", "CAST(event_id AS VARCHAR)")} AS h
       |  FROM events),
       |lm AS (SELECT g, day, v, h,
       |    CAST(60 - length(bin(h)) AS INT) AS lmax FROM ev),
       |days AS (SELECT DISTINCT g, day FROM ev),
       |win AS (SELECT d.g, d.day AS rday, l.v, l.h, l.lmax FROM lm l
       |  JOIN days d ON d.g = l.g AND l.day <= d.day
       |    AND l.day > d.day - 7),
       |counts AS (SELECT g, rday, lmax, COUNT(*) AS c FROM win
       |  GROUP BY 1, 2, 3),
       |cum AS (SELECT g, rday, lmax,
       |    SUM(c) OVER (PARTITION BY g, rday ORDER BY lmax DESC
       |                 ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM counts),
       |lvl AS (SELECT g, rday, CAST(COALESCE(
       |      MAX(CASE WHEN cum > 128 THEN lmax + 1 END), 0) AS INT)
       |    AS level FROM cum GROUP BY 1, 2),
       |meta AS (SELECT g, rday, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM win GROUP BY 1, 2),
       |kept AS (SELECT w.g, w.rday, w.v, l.level,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY w.g, w.rday
       |      ORDER BY w.v ASC, w.h ASC) AS BIGINT) - 1 AS i
       |  FROM win w JOIN lvl l ON l.g = w.g AND l.rday = w.rday
       |  WHERE w.lmax >= l.level),
       |qs AS (SELECT CAST(unnest([500000, 990000]) AS BIGINT) AS q_ppm),
       |cand AS (SELECT k.g, k.rday, q.q_ppm, m.n, k.level, k.v,
       |    k.i * (1::BIGINT << k.level) AS est_rank,
       |    abs(k.i * (1::BIGINT << k.level) * 1000000
       |        - q.q_ppm * (m.n - 1)) AS cost
       |  FROM kept k CROSS JOIN qs q
       |  JOIN meta m ON m.g = k.g AND m.rday = k.rday),
       |pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g, rday, q_ppm
       |    ORDER BY cost ASC, est_rank ASC) AS r FROM cand)
       |SELECT g AS event_type, rday AS day, q_ppm, n, level,
       |  v AS value, est_rank
       |FROM pick WHERE r = 1 ORDER BY 1, 2, 3""".stripMargin
}
