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
private[graft] trait QueriesChangeCapture { this: Queries.type =>
  // ----------------------------------------------------------- change capture
  /** q98: snapshot diff ([[ChangeCapture.snapshotDiff]]) — CDC between
    * two releases of the documents corpus, both derived
    * deterministically from the table: `old` misses the `% 11 == 3`
    * rows (→ inserts), `new` misses the `% 13 == 5` rows (→ deletes)
    * and rewrites text on `% 7 == 0` rows (→ updates). The operator
    * compares pre-hashed signatures; the oracle replays the SEMANTIC
    * contract (column-wise IS DISTINCT FROM) — agreement also pins
    * the signature recipe faithful.
    */
  def snapshotDiffDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val oldS = docs.where(col("doc_id") % 11 =!= 3)
    val newS = docs.where(col("doc_id") % 13 =!= 5)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit("!")))
          .otherwise(col("text")))
    ChangeCapture.snapshotDiff(oldS, newS,
        Seq("doc_id"), Seq("text", "lang", "source", "n_chars"))
      .orderBy("doc_id")
  }

  val snapshotDiffDocsSql: String =
    """WITH olds AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  WHERE doc_id % 11 <> 3),
      |news AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || '!' ELSE text END AS text,
      |    lang, source, n_chars
      |  FROM documents WHERE doc_id % 13 <> 5),
      |j AS (
      |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.doc_id IS NULL THEN 'insert'
      |         WHEN n.doc_id IS NULL THEN 'delete'
      |         WHEN (o.text IS DISTINCT FROM n.text)
      |           OR (o.lang IS DISTINCT FROM n.lang)
      |           OR (o.source IS DISTINCT FROM n.source)
      |           OR (o.n_chars IS DISTINCT FROM n.n_chars)
      |         THEN 'update' END AS op
      |  FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id)
      |SELECT doc_id, op FROM j WHERE op IS NOT NULL
      |ORDER BY doc_id""".stripMargin

  /** q99: SCD2 history ([[ChangeCapture.scd2]]) — validity intervals
    * of each user's event_type from the events log (micros timeline,
    * event_id tiebreak), no-op transitions collapsed. valid_to is
    * null on the current state.
    */
  def scd2Users(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").withColumn("ts", expr("ts div 1000"))
      .where(col("user_id") < 100)
    ChangeCapture.scd2(ev, Seq("user_id"), "ts", "event_id", Seq("event_type"))
      .orderBy("user_id", "valid_from", "event_type")
  }

  val scd2UsersSql: String =
    """WITH src AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts, event_id, event_type
      |  FROM events WHERE user_id < 100),
      |d AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM src),
      |k AS (
      |  SELECT user_id, ts, event_id, event_type FROM d
      |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |FROM k ORDER BY user_id, valid_from, event_type""".stripMargin

  /** q100: key-skew profile ([[Profile.keySkew]]) — the pre-join skew
    * report over the events stream's user_id: 10 heaviest users with
    * exact ppm shares plus the count-per-key distribution (discrete
    * p50/p90/p99). Every output is integer arithmetic; the oracle
    * replays the frequency-of-frequencies percentile rule and the
    * (cnt desc, key asc) heavy-key order literally.
    */
  def keySkewEvents(s: SparkSession, dir: String): DataFrame =
    Profile.keySkew(t(s, dir, "events").select("user_id"), "user_id", topK = 10)
      .orderBy("rank")

  val keySkewEventsSql: String =
    """WITH counts AS (
      |  SELECT CAST(user_id AS BIGINT) AS key, COUNT(*) AS cnt
      |  FROM events GROUP BY 1),
      |tot AS (
      |  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total_rows,
      |    MAX(cnt) AS max_cnt FROM counts),
      |freq AS (SELECT cnt, COUNT(*) AS n_at FROM counts GROUP BY cnt),
      |cum AS (
      |  SELECT cnt, SUM(n_at) OVER (ORDER BY cnt ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_keys
      |  FROM freq),
      |bounds AS (
      |  SELECT
      |    MIN(CASE WHEN cum_keys * 100 >= n_keys * 50 THEN cnt END) AS p50_cnt,
      |    MIN(CASE WHEN cum_keys * 100 >= n_keys * 90 THEN cnt END) AS p90_cnt,
      |    MIN(CASE WHEN cum_keys * 100 >= n_keys * 99 THEN cnt END) AS p99_cnt
      |  FROM cum, tot),
      |heavy AS (
      |  SELECT * FROM (
      |    SELECT key, cnt,
      |      ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rank
      |    FROM counts) WHERE rank <= 10)
      |SELECT CAST(t.rank AS BIGINT) AS rank, t.key, t.cnt,
      |  CAST((t.cnt * 1000000) // g.total_rows AS BIGINT) AS share_ppm,
      |  g.n_keys, g.total_rows, g.max_cnt,
      |  b.p50_cnt, b.p90_cnt, b.p99_cnt
      |FROM heavy t, tot g, bounds b ORDER BY t.rank""".stripMargin

  /** q101: decayed engagement score ([[Stats.decayedSum]]) — per-user
    * recency-weighted activity over events with a 7-day half-life,
    * anchored on the data's max day. All-integer output; the oracle
    * replays the per-day sums, the shift quantization and the exact
    * power-of-two floor division.
    */
  def decayedEngagement(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"), col("value"))
    Stats.decayedSum(ev, "user_id", "day", "value", halfLifeDays = 7)
      .withColumnRenamed("key", "user_id")
      .orderBy("user_id")
  }

  val decayedEngagementSql: String =
    """WITH src AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
      |    CAST(FLOOR(value * 10000) AS BIGINT) AS vs
      |  FROM events WHERE value IS NOT NULL),
      |anc AS (SELECT MAX(day) AS anchor FROM src),
      |pd AS (
      |  SELECT user_id, day, CAST(SUM(vs) AS BIGINT) AS daysum,
      |    COUNT(*) AS n
      |  FROM src GROUP BY user_id, day),
      |terms AS (
      |  SELECT user_id,
      |    CAST(FLOOR(CAST(daysum AS DOUBLE) /
      |      POWER(2.0, LEAST((anchor - day) // 7, 62))) AS BIGINT) AS term,
      |    n
      |  FROM pd, anc)
      |SELECT user_id, CAST(SUM(term) AS BIGINT) AS score_scaled,
      |  CAST(SUM(n) AS BIGINT) AS n_events
      |FROM terms GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q102: z-order zone-map pruning arithmetic ([[Layout]]) — lineitem
    * clustered on Morton(l_partkey, l_suppkey) vs a single-column
    * layout, both profiled into 64x64-cell zones, then the planner-side
    * scan estimate for the box l_partkey∈[100,300] ∧ l_suppkey∈[10,40].
    * Pure integer bit arithmetic end-to-end; the oracle replays the
    * 16-bit interleave literally via a lateral bit sum. The z-order row
    * reads ~2 orders of magnitude fewer rows — the measurable claim
    * behind clustering a 100 TB table before writing it.
    */
  def zorderScan(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "lineitem")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val z = pts.withColumn("z", Layout.zValue(col("x"), col("y"), bits = 16))
    val zZones = Layout.zoneProfile(z, shiftright(col("z"), 12), "x", "y")
    val xZones = Layout.zoneProfile(pts, shiftright(col("x"), 6), "x", "y")
    Layout.boxScan(zZones, 100, 300, 10, 40)
      .withColumn("layout", lit("zorder"))
      .unionByName(Layout.boxScan(xZones, 100, 300, 10, 40)
        .withColumn("layout", lit("by_x")))
      .select(col("layout"), col("n_zones"), col("n_rows"),
        col("zones_touched"), col("rows_touched"))
      .orderBy("layout")
  }

  val zorderScanSql: String =
    """WITH pts AS (SELECT l_partkey AS x, l_suppkey AS y FROM lineitem),
      |z AS (
      |  SELECT x, y,
      |    (SELECT CAST(SUM((((x >> i) & 1) << (2*i)) +
      |                     (((y >> i) & 1) << (2*i+1))) AS BIGINT)
      |     FROM range(16) t(i)) AS z
      |  FROM pts),
      |zz AS (
      |  SELECT z >> 12 AS zone, MIN(x) AS min_x, MAX(x) AS max_x,
      |    MIN(y) AS min_y, MAX(y) AS max_y, COUNT(*) AS n_rows
      |  FROM z GROUP BY 1),
      |xz AS (
      |  SELECT x >> 6 AS zone, MIN(x) AS min_x, MAX(x) AS max_x,
      |    MIN(y) AS min_y, MAX(y) AS max_y, COUNT(*) AS n_rows
      |  FROM pts GROUP BY 1),
      |scan AS (
      |  SELECT 'zorder' AS layout, COUNT(*) AS n_zones,
      |    CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS n_rows,
      |    CAST(COALESCE(SUM(CASE WHEN NOT (max_x < 100 OR min_x > 300 OR
      |      max_y < 10 OR min_y > 40) THEN 1 ELSE 0 END), 0) AS BIGINT)
      |      AS zones_touched,
      |    CAST(COALESCE(SUM(CASE WHEN NOT (max_x < 100 OR min_x > 300 OR
      |      max_y < 10 OR min_y > 40) THEN n_rows ELSE 0 END), 0) AS BIGINT)
      |      AS rows_touched
      |  FROM zz
      |  UNION ALL
      |  SELECT 'by_x', COUNT(*),
      |    CAST(COALESCE(SUM(n_rows), 0) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN NOT (max_x < 100 OR min_x > 300 OR
      |      max_y < 10 OR min_y > 40) THEN 1 ELSE 0 END), 0) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN NOT (max_x < 100 OR min_x > 300 OR
      |      max_y < 10 OR min_y > 40) THEN n_rows ELSE 0 END), 0) AS BIGINT)
      |  FROM xz)
      |SELECT * FROM scan ORDER BY layout""".stripMargin

  /** q103: declarative quality gate ([[Quality]]) — the pre-ingest
    * contract report over lineitem: three row-local checks folded into
    * ONE scan, a uniqueness check (one key shuffle) and referential
    * integrity against part (one join on the collapsed dim). All-integer
    * metrics; the oracle replays each violation count and the ppm
    * cross-multiplication pass rule.
    */
  def qualityReport(s: SparkSession, dir: String): DataFrame =
    Quality.run(t(s, dir, "lineitem"), Seq(
      Quality.NotNull("l_shipdate"),
      Quality.InRange("l_discount", 0.0, 0.05, maxPpm = 600000L),
      Quality.InSet("l_returnflag", Seq("A", "N")),
      Quality.Unique(Seq("l_orderkey", "l_linenumber")),
      Quality.RefIntegrity("l_partkey", t(s, dir, "part"), "p_partkey")))

  val qualityReportSql: String =
    """WITH sc AS (
      |  SELECT COUNT(*) AS total,
      |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v0,
      |    CAST(SUM(CASE WHEN l_discount IS NOT NULL AND
      |      (l_discount < 0.0 OR l_discount > 0.05) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v1,
      |    CAST(SUM(CASE WHEN l_returnflag IS NOT NULL AND
      |      l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v2
      |  FROM lineitem),
      |u AS (
      |  SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS viol,
      |    CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS total
      |  FROM (SELECT COUNT(*) AS cnt FROM lineitem
      |        GROUP BY l_orderkey, l_linenumber)),
      |r AS (
      |  SELECT CAST(COALESCE(SUM(CASE WHEN d.p_partkey IS NULL THEN 1
      |    ELSE 0 END), 0) AS BIGINT) AS viol, COUNT(*) AS total
      |  FROM lineitem l
      |  LEFT JOIN (SELECT DISTINCT p_partkey FROM part) d
      |    ON l.l_partkey = d.p_partkey
      |  WHERE l.l_partkey IS NOT NULL),
      |rep AS (
      |  SELECT 1 AS ord, 'not_null(l_shipdate)' AS check_name,
      |    v0 AS violations, total, CAST(0 AS BIGINT) AS max_ppm FROM sc
      |  UNION ALL SELECT 2, 'in_range(l_discount)', v1, total, 600000 FROM sc
      |  UNION ALL SELECT 3, 'in_set(l_returnflag)', v2, total, 0 FROM sc
      |  UNION ALL SELECT 4, 'unique(l_orderkey,l_linenumber)', viol, total,
      |    0 FROM u
      |  UNION ALL SELECT 5, 'ref(l_partkey)', viol, total, 0 FROM r)
      |SELECT check_name, violations, total,
      |  CASE WHEN total = 0 THEN 0
      |       ELSE (violations * 1000000) // total END AS viol_ppm,
      |  violations * 1000000 <= max_ppm * total AS passed
      |FROM rep ORDER BY ord""".stripMargin

  /** q104: strict-sequence funnel ([[Behavior.funnel]]) — of the users
    * who ever viewed, how many later clicked, and of those how many
    * later purchased (earliest-event chaining, strictly-after). Exact
    * integer counts + floor-ppm conversion shares; the oracle replays
    * the per-step min-timestamp chaining literally.
    */
  def funnelEvents(s: SparkSession, dir: String): DataFrame =
    Behavior.funnel(t(s, dir, "events"), "user_id", "ts", Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase")))
      .orderBy("step")

  val funnelEventsSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_type FROM events),
      |s1 AS (SELECT user_id, MIN(ts) AS t FROM e
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
      |c AS (
      |  SELECT 1 AS step, 'view' AS step_name,
      |    (SELECT COUNT(*) FROM s1) AS users
      |  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
      |  UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)),
      |d AS (SELECT step, step_name, users,
      |        LAG(users) OVER (ORDER BY step) AS prev,
      |        FIRST_VALUE(users) OVER (ORDER BY step) AS u1
      |      FROM c)
      |SELECT CAST(step AS BIGINT) AS step, step_name,
      |  CAST(users AS BIGINT) AS users,
      |  CAST(CASE WHEN u1 = 0 THEN 0
      |       ELSE (users * 1000000) // u1 END AS BIGINT) AS conv_ppm,
      |  CAST(CASE WHEN prev IS NULL THEN
      |         (CASE WHEN users = 0 THEN 0 ELSE 1000000 END)
      |       WHEN prev = 0 THEN 0
      |       ELSE (users * 1000000) // prev END AS BIGINT) AS step_ppm
      |FROM d ORDER BY step""".stripMargin

  /** q105: weekly cohort retention ([[Behavior.retention]]) — users
    * cohorted by first-seen week (day div 7 off the data's own epoch),
    * one cell per (cohort, offset) with exact active counts and
    * floor-ppm retention.
    */
  def retentionEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    Behavior.retention(ev, "user_id", "day", bucket = 7)
      .orderBy("cohort", "offset")
  }

  val retentionEventsSql: String =
    """WITH e AS (SELECT user_id,
      |    (epoch_ns(ts) // 86400000000000) // 7 AS p FROM events),
      |f AS (SELECT user_id, MIN(p) AS cohort FROM e GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, p FROM e),
      |cells AS (SELECT cohort, p - cohort AS "offset",
      |    COUNT(*) AS active_users
      |  FROM a JOIN f USING (user_id) GROUP BY 1, 2),
      |sz AS (SELECT cohort, COUNT(*) AS cohort_size FROM f GROUP BY 1)
      |SELECT c.cohort, c."offset",
      |  CAST(c.active_users AS BIGINT) AS active_users,
      |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
      |  CAST((c.active_users * 1000000) // s.cohort_size AS BIGINT)
      |    AS retained_ppm
      |FROM cells c JOIN sz s USING (cohort)
      |ORDER BY cohort, c."offset"""".stripMargin

  /** q106: empirical Markov transition matrix
    * ([[Behavior.transitions]]) — consecutive event-type pairs per
    * user (ordered by ts with event_id tie-break), counted into the
    * |types|² matrix with exact floor-ppm row probabilities.
    */
  def transitionsEvents(s: SparkSession, dir: String): DataFrame =
    Behavior.transitions(t(s, dir, "events"), "user_id", "ts",
      "event_id", "event_type")
      .orderBy("src", "dst")

  val transitionsEventsSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id,
      |    event_type FROM events),
      |p AS (SELECT event_type AS dst,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS src
      |  FROM e),
      |c AS (SELECT src, dst, COUNT(*) AS transitions FROM p
      |  WHERE src IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, CAST(transitions AS BIGINT) AS transitions,
      |  CAST((transitions * 1000000) //
      |    SUM(transitions) OVER (PARTITION BY src) AS BIGINT) AS p_ppm
      |FROM c ORDER BY src, dst""".stripMargin

  /** q107: exact triangle census ([[Graph.triangles]]) over the part
    * co-purchase graph (parts sharing an order, baskets capped at 6
    * items — the standard market-basket guard against quadratic pair
    * blowup from giant carts). Degree orientation bounds the wedge
    * work by O(m·√m) on any skew; the single output row reports the
    * enumerated wedges alongside the triangle count, so the pruning is
    * measurable. Oracle replays orientation, wedges and closing join.
    */
  def trianglesParts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val small = li.groupBy(col("ok")).agg(count(lit(1)).as("n"))
      .where(col("n") <= 6).select(col("ok"))
    val li2 = li.join(small, Seq("ok"), "leftsemi")
    val pairs = li2.as("x").join(li2.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    Graph.triangles(pairs)
  }

  val trianglesPartsSql: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |ok6 AS (SELECT ok FROM li GROUP BY ok HAVING COUNT(*) <= 6),
      |li2 AS (SELECT li.* FROM li JOIN ok6 USING (ok)),
      |e AS (SELECT DISTINCT x.pk AS a, y.pk AS b FROM li2 x
      |  JOIN li2 y ON x.ok = y.ok AND x.pk < y.pk),
      |deg AS (SELECT id, COUNT(*) AS deg FROM
      |  (SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      |o AS (SELECT
      |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
      |      THEN e.a ELSE e.b END AS u,
      |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
      |      THEN e.b ELSE e.a END AS v
      |  FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b),
      |w AS (SELECT e1.v AS a, e2.v AS b FROM o e1
      |  JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v),
      |cl AS (SELECT COUNT(*) AS n_wedges,
      |    CAST(COALESCE(SUM(m.hit), 0) AS BIGINT) AS n_triangles
      |  FROM w LEFT JOIN (SELECT a, b, 1 AS hit FROM e) m
      |    ON w.a = m.a AND w.b = m.b)
      |SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
      |  CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
      |  CAST(n_wedges AS BIGINT) AS n_wedges, n_triangles
      |FROM cl""".stripMargin

  /** q108: compaction planning ([[Layout.compactionPlan]]) — lineitem's
    * daily "files" per returnflag partition (bytes = 100·rows proxy)
    * packed into 100 KB bins in ship-date order. Bin ids, counts and
    * floor-ppm fill are pure prefix arithmetic, replayed exactly by
    * the oracle's window cumsum.
    */
  def compactionLineitem(s: SparkSession, dir: String): DataFrame = {
    val files = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"),
        col("l_shipdate").cast("date").as("d"))
      .agg((count(lit(1)) * 100L).as("bytes"))
    Layout.compactionPlan(files, Seq("flag"), "d", "bytes",
        targetBytes = 100000L)
      .select(col("flag"), col("bin"), col("n_files"), col("bytes"),
        col("fill_ppm"))
      .orderBy("flag", "bin")
  }

  val compactionLineitemSql: String =
    """WITH f AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
      |    COUNT(*) * 100 AS bytes FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT flag, d, bytes,
      |    SUM(bytes) OVER (PARTITION BY flag ORDER BY d) AS cum FROM f),
      |b AS (SELECT flag, (cum - bytes) // 100000 AS bin, bytes FROM c)
      |SELECT flag, CAST(bin AS BIGINT) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_files,
      |  CAST(SUM(bytes) AS BIGINT) AS bytes,
      |  CAST((SUM(bytes) * 1000000) // 100000 AS BIGINT) AS fill_ppm
      |FROM b GROUP BY 1, 2 ORDER BY flag, bin""".stripMargin

  /** q109: interval coalescing ([[IntervalJoin.coalesceIntervals]]) —
    * each event opens a 30-minute activity window `[sec, sec+1800]`;
    * overlapping windows per user merge into disjoint activity spans
    * (one shuffle + one in-partition sweep). The oracle replays the
    * exclusive-prefix running-max break rule and the cumulative span
    * ids literally.
    */
  def intervalMergeEvents(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "events").select(col("user_id"), col("event_id"),
      expr("ts div 1000000000").as("s"),
      (expr("ts div 1000000000") + 1800L).as("e"))
    IntervalJoin.coalesceIntervals(iv, "user_id", "event_id", "s", "e")
      .orderBy("user_id", "start")
  }

  val intervalMergeEventsSql: String =
    """WITH iv AS (SELECT user_id, event_id,
      |    epoch_ns(ts) // 1000000000 AS s,
      |    epoch_ns(ts) // 1000000000 + 1800 AS e FROM events),
      |m AS (SELECT user_id, event_id, s, e,
      |    MAX(e) OVER (PARTITION BY user_id ORDER BY s ASC, e ASC,
      |      event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS pmax
      |  FROM iv),
      |b AS (SELECT user_id, event_id, s, e,
      |    CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk
      |  FROM m),
      |g AS (SELECT user_id, s, e,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY s ASC, e ASC,
      |      event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS grp
      |  FROM b)
      |SELECT user_id, MIN(s) AS "start", MAX(e) AS "end",
      |  CAST(COUNT(*) AS BIGINT) AS n_merged
      |FROM g GROUP BY user_id, grp
      |ORDER BY user_id, "start"""".stripMargin

  /** q110: top journey trigrams ([[Behavior.pathNgrams]]) — the 20 most
    * frequent 3-step event-type runs across all users, ranked
    * (count desc, path asc). TakeOrderedAndProject top-k, no global
    * sort; exact counts replayed by the oracle's LEAD chain.
    */
  def pathTrigrams(s: SparkSession, dir: String): DataFrame =
    Behavior.pathNgrams(t(s, dir, "events"), "user_id", "ts",
      "event_id", "event_type", n = 3, topK = 20)

  val pathTrigramsSql: String =
    """WITH p AS (SELECT event_type AS s0,
      |    LEAD(event_type, 1) OVER w AS s1,
      |    LEAD(event_type, 2) OVER w AS s2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |    ORDER BY epoch_ns(ts) ASC, event_id ASC)),
      |g AS (SELECT s0 || '>' || s1 || '>' || s2 AS path,
      |    COUNT(*) AS n
      |  FROM p WHERE s2 IS NOT NULL GROUP BY 1)
      |SELECT path, CAST(n AS BIGINT) AS n FROM g
      |ORDER BY n DESC, path ASC LIMIT 20""".stripMargin

  /** q111: one-scan correlation matrix ([[Profile.correlationMatrix]])
    * over lineitem's four numeric measures. Moments aggregate as exact
    * DECIMAL(38,0) integers (reduction-order independent); the Pearson
    * formula then runs on engine-identical doubles, so the floor-ppm
    * correlations hash-match. Pairwise deletion per pair.
    */
  def correlationLineitem(s: SparkSession, dir: String): DataFrame =
    Profile.correlationMatrix(t(s, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("col_a", "col_b")

  val correlationLineitemSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val pairSelects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  CAST(COALESCE(SUM(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL
         |    THEN CAST(FLOOR($a * 10000) AS DECIMAL(38,0)) END) AS DOUBLE) AS sx,
         |  CAST(SUM(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL
         |    THEN CAST(FLOOR($b * 10000) AS DECIMAL(38,0)) END) AS DOUBLE) AS sy,
         |  CAST(SUM(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL
         |    THEN CAST(FLOOR($a * 10000) AS DECIMAL(38,0)) *
         |         CAST(FLOOR($a * 10000) AS DECIMAL(38,0)) END) AS DOUBLE) AS sxx,
         |  CAST(SUM(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL
         |    THEN CAST(FLOOR($b * 10000) AS DECIMAL(38,0)) *
         |         CAST(FLOOR($b * 10000) AS DECIMAL(38,0)) END) AS DOUBLE) AS syy,
         |  CAST(SUM(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL
         |    THEN CAST(FLOOR($a * 10000) AS DECIMAL(38,0)) *
         |         CAST(FLOOR($b * 10000) AS DECIMAL(38,0)) END) AS DOUBLE) AS sxy
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS (
       |$pairSelects
       |)
       |SELECT col_a, col_b, n,
       |  CASE WHEN n < 2 OR n * sxx - sx * sx <= 0.0
       |         OR n * syy - sy * sy <= 0.0 THEN NULL
       |       ELSE CAST(FLOOR((n * sxy - sx * sy) /
       |         SQRT(n * sxx - sx * sx) / SQRT(n * syy - sy * sy)
       |         * 1000000.0) AS BIGINT) END AS corr_ppm
       |FROM m ORDER BY col_a, col_b""".stripMargin
  }

  /** q112: Benford first-digit screen ([[Quality.benfordScreen]]) over
    * lineitem's extended price. Counts and floor-ppm shares are exact;
    * the expected shares are baked-in integer constants, so the whole
    * report is engine-replayable (no runtime log10).
    */
  def benfordLineitem(s: SparkSession, dir: String): DataFrame =
    Quality.benfordScreen(t(s, dir, "lineitem"), "l_extendedprice")
      .orderBy("digit")

  val benfordLineitemSql: String =
    """WITH b(digit, benford_ppm) AS (VALUES
      |  (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
      |  (6, 66946), (7, 57991), (8, 51152), (9, 45757)),
      |v AS (SELECT CAST(FLOOR(l_extendedprice) AS BIGINT) AS v
      |  FROM lineitem WHERE FLOOR(l_extendedprice) >= 1),
      |c AS (SELECT CAST(SUBSTRING(CAST(v AS VARCHAR), 1, 1) AS INT)
      |    AS digit, COUNT(*) AS n
      |  FROM v GROUP BY 1),
      |tot AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS total FROM c),
      |r AS (SELECT b.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
      |    CAST(b.benford_ppm AS BIGINT) AS benford_ppm, t.total
      |  FROM b LEFT JOIN c ON b.digit = c.digit, tot t)
      |SELECT digit, n,
      |  CAST(CASE WHEN total = 0 THEN 0
      |       ELSE (n * 1000000) // total END AS BIGINT) AS observed_ppm,
      |  benford_ppm,
      |  CAST(CASE WHEN total = 0 THEN 0
      |       ELSE (n * 1000000) // total END - benford_ppm AS BIGINT)
      |    AS delta_ppm
      |FROM r ORDER BY digit""".stripMargin

  /** q113: BM25 ranked retrieval ([[TextAnalysis.bm25TopK]]) — top-10
    * documents for two literal search queries. Per-term scores truncate
    * to e6 integers before the cross-term sum, so ranking is pure
    * integer comparison; the oracle replays the identical double chain
    * and the (score DESC, doc ASC) window the bounded [[TopKAgg]]
    * aggregate discards against.
    */
  val bm25Queries: Seq[(Long, String)] =
    Seq(1L -> "spark hash join", 2L -> "stream window agg")

  def bm25Search(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        bm25Queries, 10)
      .orderBy("query_id", "rnk")

  /** The shared WITH prelude of the BM25 oracles (q113/q137 ranked,
    * q249 threshold, q272's unpruned replay), parameterized by the
    * query batch: tokenize → tf/dl/stats → query terms → df →
    * per-term e6 scores → per-(query, doc) integer sums.
    */
  private[graft] def bm25AggSqlFor(queries: Seq[(Long, String)]): String = {
    val qtRows = queries.flatMap { case (qid, text) =>
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
        .map(term => s"($qid, '$term')")
    }.mkString(", ")
    bm25AggSqlQt(s"qt(query_id, term) AS (VALUES $qtRows)")
  }

  /** [[bm25AggSqlFor]] with the query-term table given as an arbitrary
    * CTE body — the q275 data-sized query relation derives its qt from
    * the documents table instead of driver literals.
    */
  private[graft] def bm25AggSqlQt(qtCte: String): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($duckToks) AS term
       |  FROM documents WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
       |$qtCte,
       |tfq AS (SELECT * FROM tf WHERE term IN (SELECT DISTINCT term FROM qt)),
       |df AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY term),
       |scored AS (
       |  SELECT qt.query_id, tfq.doc_id,
       |    CAST(FLOOR(
       |      ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5)) *
       |      ((tfq.tf * (1.2 + 1.0)) /
       |       (tfq.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (CAST(s.sumdl AS DOUBLE) / s.n))))) *
       |      1000000.0) AS BIGINT) AS e6
       |  FROM tfq JOIN qt USING (term) JOIN df USING (term)
       |    JOIN dl USING (doc_id) CROSS JOIN stats s),
       |agg AS (SELECT query_id, doc_id, CAST(SUM(e6) AS BIGINT) AS score_e6
       |  FROM scored GROUP BY query_id, doc_id)""".stripMargin

  private[graft] val bm25AggSql: String = bm25AggSqlFor(bm25Queries)

  val bm25SearchSql: String =
    s"""$bm25AggSql,
       |ranked AS (SELECT query_id, doc_id, score_e6,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_e6 DESC, doc_id ASC) AS rnk
       |  FROM agg)
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rnk,
       |  doc_id, score_e6
       |FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  /** q249: the BM25 THRESHOLD screen through the persisted-index
    * lifecycle ([[TextAnalysis.bm25ScreenIndexed]] over a
    * saved+appended [[IndexStore]] text index) — the lexical member of
    * the indexed-screen family and the batch twin of
    * [[graft.streaming.StreamOps.searchGate]]: every (query, doc) at
    * score_e6 ≥ 1,000,000 for the q113 prompts, un-ranked (the
    * decontamination shape — top-k would truncate the tail this exists
    * to surface). Oracle: the q113 replay with the ranked tail swapped
    * for the threshold filter; scores are e6 integers, so the compare
    * is exact.
    */
  def bm25ScreenLoad(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = scratchDir("text_screen_idx")
    IndexStore.saveTextIndex(docs.where(col("doc_id") < 300),
      "doc_id", "text", path)
    IndexStore.appendTextIndex(docs.where(col("doc_id") >= 300),
      "doc_id", "text", path)
    TextAnalysis.bm25ScreenIndexed(IndexStore.loadTextIndex(s, path),
        bm25Queries, minScoreE6 = 1000000L)
      .orderBy("query_id", "doc_id")
  }

  val bm25ScreenLoadSql: String =
    s"""$bm25AggSql
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_e6
       |FROM agg WHERE score_e6 >= 1000000 ORDER BY query_id, doc_id""".stripMargin

  /** q272: RANKED BM25 retrieval under the lossless WAND/MaxScore
    * prune ([[TextAnalysis.bm25TopKIndexed]]'s `maxScorePrune`,
    * verdict-13 ask #1) through the persisted-index lifecycle. The
    * q268 precedent at top-k grain: the prune's two-pass plan (seed
    * the rarest matched terms → exact seed scores → per-query k-th
    * seed score as the adaptive θ → essential-prefix candidates →
    * exact scoring) must be BIT-IDENTICAL to the brute-force ranking,
    * so the oracle is the UNPRUNED full replay — the q113 chain over a
    * query batch that includes a stopword-shaped query (every term
    * common — the worst case the prune exists for; its θ comes from
    * the seed's exact scores, not a tuned threshold).
    */
  val bm25TopKPrunedQueries: Seq[(Long, String)] =
    bm25Queries ++ Seq(3L -> "the a table value row")

  def bm25TopKPruned(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = scratchDir("text_topk_maxscore")
    IndexStore.saveTextIndex(docs, "doc_id", "text", path)
    TextAnalysis.bm25TopKIndexed(IndexStore.loadTextIndex(s, path),
        bm25TopKPrunedQueries, 12, maxScorePrune = true)
      .orderBy("query_id", "rnk")
  }

  val bm25TopKPrunedSql: String =
    s"""${bm25AggSqlFor(bm25TopKPrunedQueries)},
       |ranked AS (SELECT query_id, doc_id, score_e6,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_e6 DESC, doc_id ASC) AS rnk
       |  FROM agg)
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rnk,
       |  doc_id, score_e6
       |FROM ranked WHERE rnk <= 12 ORDER BY query_id, rnk""".stripMargin

  /** q275: ranked BM25 retrieval over a DATA-SIZED query RELATION
    * ([[TextAnalysis.bm25TopKJoin]], verdict-14 ask #1) — the one
    * exposure gap the round-14 verdict named: `bm25TopKIndexed` takes
    * a driver-literal batch (the search-request shape), but retrieval
    * at 100 TB means a query TABLE (millions of eval prompts,
    * hard-negative mining at corpus grain). Queries here are a
    * RELATION derived from the documents table itself — every doc_id
    * ≡ 3 (mod 21), query text = the doc's first six tokens (the
    * eval-prompt shape) — run through the PRUNED two-pass path with
    * NO broadcast hints on any query-derived relation (the ingestText
    * posture: AQE decides). Oracle: the UNPRUNED brute-force ranking
    * over the SAME derived query table — the q272 losslessness-by-hash
    * proof with the query side now a data-sized relation.
    */
  /** The q275/q277 shared DATA-SIZED query relation — every doc_id ≡ 3
    * (mod 21), query text = the doc's first six tokens — and its DuckDB
    * qt CTE, defined ONCE so the ranked and threshold forms cannot
    * drift apart (their scaladocs both claim "the same derived qt").
    */
  private def docDerivedQueries(docs: DataFrame): DataFrame = docs
    .where(pmod(col("doc_id"), lit(21)) === 3 && col("text").isNotNull)
    .select(col("doc_id").as("query_id"),
      array_join(slice(TextFunctions.tokens(col("text")), 1, 6), " ")
        .as("qtext"))

  private val docDerivedQtCte: String =
    s"""qt AS (SELECT DISTINCT doc_id AS query_id, unnest(toks6) AS term
       |  FROM (SELECT doc_id, ($duckToks)[1:6] AS toks6
       |        FROM documents
       |        WHERE text IS NOT NULL AND doc_id % 21 = 3))""".stripMargin

  def bm25TopKJoined(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = scratchDir("text_topk_join")
    IndexStore.saveTextIndex(docs, "doc_id", "text", path)
    // forced Some(true), not auto: this query IS the pruned path's
    // losslessness proof against the unpruned brute-force oracle —
    // auto (which would pick the direct plan at this shape) would
    // silently un-prove it
    TextAnalysis.bm25TopKJoin(IndexStore.loadTextIndex(s, path),
        docDerivedQueries(docs), "query_id", "qtext", 5,
        maxScorePrune = Some(true))
      .orderBy("query_id", "rnk")
  }

  val bm25TopKJoinedSql: String =
    s"""${bm25AggSqlQt(docDerivedQtCte)},
       |ranked AS (SELECT query_id, doc_id, score_e6,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_e6 DESC, doc_id ASC) AS rnk
       |  FROM agg)
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rnk,
       |  doc_id, score_e6
       |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** q277: the BM25 THRESHOLD screen over a DATA-SIZED query RELATION
    * ([[TextAnalysis.bm25ScreenJoin]]) — decontamination at eval-set
    * grain: the q275 documents-derived query table (doc_id ≡ 3 mod 21,
    * first six tokens) screened un-ranked at score_e6 ≥ 2,000,000 (6-token queries over a shared-vocabulary corpus score low — the threshold keeps ~3.6k pairs across 59 queries, a non-vacuous tail)
    * through the PRUNED path. Oracle: the same derived-qt prelude with
    * the threshold filter — the q249 tail at relation grain, and the
    * prune's losslessness proof (pairs ≥ thr are scored exactly).
    */
  def bm25ScreenJoined(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = scratchDir("text_screen_join")
    IndexStore.saveTextIndex(docs, "doc_id", "text", path)
    TextAnalysis.bm25ScreenJoin(IndexStore.loadTextIndex(s, path),
        docDerivedQueries(docs), "query_id", "qtext",
        minScoreE6 = 2000000L, maxScorePrune = Some(true))
      .orderBy("query_id", "doc_id")
  }

  val bm25ScreenJoinedSql: String =
    s"""${bm25AggSqlQt(docDerivedQtCte)}
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_e6
       |FROM agg WHERE score_e6 >= 2000000
       |ORDER BY query_id, doc_id""".stripMargin

  /** q279: the AUTO maxScorePrune DECISION STATISTIC itself, oracled
    * (round 16 — the statistic that now steers the flagship retrieval
    * plan must face the same gate as the plans it chooses between):
    * [[TextAnalysis.topKPruneStats]] (seed-prefix volume at the q275
    * shape, k = 5) and [[TextAnalysis.screenPruneStats]] (essential
    * volume at the q277 threshold, 2e6) over the q275/q277 shared
    * documents-derived query relation, plus both
    * [[TextAnalysis.autoPruneDecision]] booleans. The oracle replays
    * ub = ⌊idf·(k1+1)·1e6⌋, the ub-DESC seed prefix (exclusive
    * cumulative df < k), the ub-ASC essential rule (inclusive
    * cumulative ub ≥ thr), and the two-condition decision — so a
    * drifted window order, a flipped inclusivity, or a changed margin
    * breaks the hash, not just a spec.
    */
  def bm25PruneStats(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val idx = TextAnalysis.textIndex(docs, "doc_id", "text")
    val qt = TextAnalysis.queryTermsOf(docDerivedQueries(docs),
      "query_id", "qtext")
    val (sv, tv, n) = TextAnalysis.topKPruneStats(idx, qt, 5, 1.2)
    val (ev, tv2, n2) = TextAnalysis.screenPruneStats(
      idx, qt, 2000000L, 1.2, None)
    require(tv == tv2 && n == n2,
      "ranked and threshold pre-flights disagree on the shared volumes")
    import s.implicits._
    Seq((sv, ev, tv, n,
        TextAnalysis.autoPruneDecision(sv, tv, n),
        TextAnalysis.autoPruneDecision(ev, tv, n)))
      .toDF("seed_vol", "ess_vol", "tot_vol", "n_docs",
        "prune_topk", "prune_screen")
  }

  val bm25PruneStatsSql: String =
    s"""${bm25AggSqlQt(docDerivedQtCte)},
       |ub AS (SELECT df.term, df.df,
       |    CAST(FLOOR(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
       |      * 2200000.0) AS BIGINT) AS ub
       |  FROM df CROSS JOIN stats s),
       |m AS (SELECT qt.query_id, qt.term, ub.df, ub.ub
       |  FROM qt JOIN ub USING (term)),
       |seedcum AS (SELECT query_id, df,
       |    SUM(df) OVER (PARTITION BY query_id
       |      ORDER BY ub DESC, term ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM m),
       |esscum AS (SELECT query_id, df, ub,
       |    SUM(ub) OVER (PARTITION BY query_id
       |      ORDER BY ub ASC, term ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM m),
       |vols AS (SELECT
       |    (SELECT CAST(COALESCE(SUM(CASE WHEN cum - df < 5 THEN df
       |        ELSE 0 END), 0) AS BIGINT) FROM seedcum) AS seed_vol,
       |    (SELECT CAST(COALESCE(SUM(CASE WHEN cum >= 2000000 THEN df
       |        ELSE 0 END), 0) AS BIGINT) FROM esscum) AS ess_vol,
       |    (SELECT CAST(COALESCE(SUM(df), 0) AS BIGINT) FROM m)
       |      AS tot_vol,
       |    (SELECT CAST(n AS BIGINT) FROM stats) AS n_docs)
       |SELECT seed_vol, ess_vol, tot_vol, n_docs,
       |  (tot_vol > 0 AND n_docs > 0 AND seed_vol * 2.0 <= n_docs
       |    AND tot_vol >= 4.0 * seed_vol) AS prune_topk,
       |  (tot_vol > 0 AND n_docs > 0 AND ess_vol * 2.0 <= n_docs
       |    AND tot_vol >= 4.0 * ess_vol) AS prune_screen
       |FROM vols""".stripMargin

  /** q114: market-basket association rules ([[Basket.pairRules]]) —
    * supplier pairs that co-occur in ≥5 orders, with floor-ppm support,
    * both-direction confidence, and two-stage-floor lift. All-integer
    * output; the oracle replays the pair generation as a plain
    * self-join (the engine's array fan-out and the join are the same
    * set by construction).
    */
  def basketRules(s: SparkSession, dir: String): DataFrame =
    Basket.pairRules(t(s, dir, "lineitem"), "l_orderkey", "l_suppkey",
        minSupport = 5)
      .orderBy(col("lift_ppm").desc, col("item_a"), col("item_b"))

  val basketRulesSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS basket, l_suppkey AS item
      |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_count
      |  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      |ic AS (SELECT item, COUNT(*) AS cnt FROM items GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT basket) AS n FROM items)
      |SELECT p.item_a, p.item_b,
      |  CAST(p.pair_count AS BIGINT) AS pair_count,
      |  CAST(a.cnt AS BIGINT) AS count_a,
      |  CAST(b.cnt AS BIGINT) AS count_b,
      |  CAST(p.pair_count * 1000000 // n.n AS BIGINT) AS support_ppm,
      |  CAST(p.pair_count * 1000000 // a.cnt AS BIGINT) AS conf_ab_ppm,
      |  CAST(p.pair_count * 1000000 // b.cnt AS BIGINT) AS conf_ba_ppm,
      |  CAST((p.pair_count * 1000000 // a.cnt) * n.n // b.cnt AS BIGINT)
      |    AS lift_ppm
      |FROM pairs p
      |  JOIN ic a ON p.item_a = a.item
      |  JOIN ic b ON p.item_b = b.item
      |  CROSS JOIN n
      |ORDER BY lift_ppm DESC, item_a, item_b""".stripMargin

  /** q115: CUSUM mean-shift screen ([[Stats.cusumShift]]) over daily
    * order counts per priority — the sequential recursion replayed as
    * a closed-form prefix-sum/running-min window pair, all-integer.
    * slack=1 absorbs the floor-mean drift bias; h=10 flags sustained
    * shifts. The oracle replays the identical windows.
    */
  def cusumOrders(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("k"),
        to_date(col("o_orderdate")).as("t"))
      .agg(count(lit(1)).as("x"))
    Stats.cusumShift(daily, "k", "t", "x", slack = 1, threshold = 10)
      .orderBy("k", "t")
  }

  val cusumOrdersSql: String =
    """WITH d AS (
      |  SELECT o_orderpriority AS k, CAST(o_orderdate AS DATE) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2),
      |tgt AS (SELECT *,
      |    CAST(SUM(x) OVER (PARTITION BY k) //
      |         COUNT(x) OVER (PARTITION BY k) AS BIGINT) AS target
      |  FROM d),
      |p AS (SELECT *,
      |    SUM(x - target - 1) OVER w AS pup,
      |    SUM(target - x - 1) OVER w AS pdn
      |  FROM tgt WINDOW w AS (PARTITION BY k ORDER BY t
      |    ROWS UNBOUNDED PRECEDING)),
      |c AS (SELECT *,
      |    pup - LEAST(0, MIN(pup) OVER w) AS cusum_up,
      |    pdn - LEAST(0, MIN(pdn) OVER w) AS cusum_dn
      |  FROM p WINDOW w AS (PARTITION BY k ORDER BY t
      |    ROWS UNBOUNDED PRECEDING))
      |SELECT k, t, x, target,
      |  CAST(cusum_up AS BIGINT) AS cusum_up,
      |  CAST(cusum_dn AS BIGINT) AS cusum_dn,
      |  cusum_up > 10 AS shift_up, cusum_dn > 10 AS shift_dn
      |FROM c ORDER BY k, t""".stripMargin

  /** q116: multi-touch attribution ([[Behavior.attribution]]) — each
    * purchase's floor-cents value distributed over the view/click/
    * signup touches in the 24h before it, under first-touch /
    * last-touch / linear at once; no-touch purchases land in
    * `(none)`. The oracle replays the pairing as a plain join and the
    * first/last resolution as (ts, id) windows.
    */
  def attributionEvents(s: SparkSession, dir: String): DataFrame =
    Behavior.attribution(t(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type", "value", convType = "purchase",
        touchTypes = Seq("view", "click", "signup"),
        lookback = 86400000000000L)
      .orderBy("channel")

  val attributionEventsSql: String =
    """WITH c AS (
      |  SELECT user_id AS k, epoch_ns(ts) AS ct, event_id AS conv_id,
      |    COALESCE(CAST(FLOOR(value * 100) AS BIGINT), 0) AS v
      |  FROM events WHERE event_type = 'purchase'),
      |tch AS (
      |  SELECT user_id AS k, epoch_ns(ts) AS tt, event_id AS touch_id,
      |    event_type AS channel
      |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
      |pairs AS (
      |  SELECT c.conv_id, c.v, t.channel, t.tt, t.touch_id
      |  FROM c JOIN tch t ON c.k = t.k
      |    AND t.tt > c.ct - 86400000000000 AND t.tt <= c.ct),
      |pcc AS (SELECT conv_id, v, channel, COUNT(*) AS cnt_c
      |  FROM pairs GROUP BY 1, 2, 3),
      |n AS (SELECT conv_id, CAST(SUM(cnt_c) AS BIGINT) AS n
      |  FROM pcc GROUP BY 1),
      |firsts AS (SELECT conv_id, channel FROM (
      |  SELECT conv_id, channel, row_number() OVER (PARTITION BY conv_id
      |    ORDER BY tt ASC, touch_id ASC) AS rn FROM pairs) WHERE rn = 1),
      |lasts AS (SELECT conv_id, channel FROM (
      |  SELECT conv_id, channel, row_number() OVER (PARTITION BY conv_id
      |    ORDER BY tt DESC, touch_id DESC) AS rn FROM pairs) WHERE rn = 1),
      |resolved AS (
      |  SELECT pcc.conv_id, pcc.v, pcc.channel, pcc.cnt_c, n.n,
      |    pcc.channel = f.channel AS is_first,
      |    pcc.channel = l.channel AS is_last
      |  FROM pcc JOIN n USING (conv_id)
      |    JOIN firsts f USING (conv_id) JOIN lasts l USING (conv_id)),
      |main AS (
      |  SELECT channel,
      |    CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS first_convs,
      |    CAST(SUM(CASE WHEN is_first THEN v ELSE 0 END) AS BIGINT) AS first_cents,
      |    CAST(SUM(CASE WHEN is_last THEN 1 ELSE 0 END) AS BIGINT) AS last_convs,
      |    CAST(SUM(CASE WHEN is_last THEN v ELSE 0 END) AS BIGINT) AS last_cents,
      |    CAST(SUM(cnt_c) AS BIGINT) AS touches,
      |    CAST(SUM(v * cnt_c // n) AS BIGINT) AS linear_cents
      |  FROM resolved GROUP BY 1),
      |none AS (
      |  SELECT '(none)' AS channel,
      |    CAST(COUNT(*) AS BIGINT) AS first_convs,
      |    CAST(COALESCE(SUM(v), 0) AS BIGINT) AS first_cents,
      |    CAST(COUNT(*) AS BIGINT) AS last_convs,
      |    CAST(COALESCE(SUM(v), 0) AS BIGINT) AS last_cents,
      |    CAST(0 AS BIGINT) AS touches,
      |    CAST(COALESCE(SUM(v), 0) AS BIGINT) AS linear_cents
      |  FROM c WHERE conv_id NOT IN (SELECT conv_id FROM pcc))
      |SELECT * FROM main UNION ALL SELECT * FROM none
      |ORDER BY channel""".stripMargin

  /** q117: snapshot profile drift ([[Profile.drift]]) — the orders
    * table split at 1998-01-01 into before/after releases, compared
    * column-by-column on null rate, distinct cardinality, and min/max
    * movement. Integer-key and string columns only (the summarize
    * string-profile rule); floor-ppm deltas; the oracle replays both
    * profiles as per-column UNION ALL scans.
    */
  def profileDrift(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cut = lit("1998-01-01").cast("timestamp")
    Profile.drift(
        o.where(col("o_orderdate") < cut),
        o.where(col("o_orderdate") >= cut),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderkey"))
      .orderBy("col_name")
  }

  val profileDriftSql: String = {
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderkey")
    def side(pred: String) = cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  COUNT(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
         |  MIN(CAST($c AS VARCHAR)) AS min_s, MAX(CAST($c AS VARCHAR)) AS max_s
         |FROM orders WHERE $pred GROUP BY 1""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH pa AS (
       |${side("o_orderdate < TIMESTAMP '1998-01-01'")}
       |), pb AS (
       |${side("o_orderdate >= TIMESTAMP '1998-01-01'")}
       |)
       |SELECT COALESCE(pa.col_name, pb.col_name) AS col_name,
       |  COALESCE(pa.n_rows, 0) AS n_rows_a, COALESCE(pb.n_rows, 0) AS n_rows_b,
       |  CASE WHEN pa.n_rows > 0 THEN pa.n_nulls * 1000000 // pa.n_rows
       |       ELSE 0 END AS null_ppm_a,
       |  CASE WHEN pb.n_rows > 0 THEN pb.n_nulls * 1000000 // pb.n_rows
       |       ELSE 0 END AS null_ppm_b,
       |  (CASE WHEN pb.n_rows > 0 THEN pb.n_nulls * 1000000 // pb.n_rows
       |        ELSE 0 END) -
       |  (CASE WHEN pa.n_rows > 0 THEN pa.n_nulls * 1000000 // pa.n_rows
       |        ELSE 0 END) AS null_delta_ppm,
       |  COALESCE(pa.n_distinct, 0) AS n_distinct_a,
       |  COALESCE(pb.n_distinct, 0) AS n_distinct_b,
       |  CASE WHEN pa.n_distinct > 0
       |       THEN pb.n_distinct * 1000000 // pa.n_distinct END
       |    AS distinct_ratio_ppm,
       |  (pa.col_name IS NULL OR pb.col_name IS NULL) AS side_missing,
       |  NOT (pa.min_s IS NOT DISTINCT FROM pb.min_s) AS min_changed,
       |  NOT (pa.max_s IS NOT DISTINCT FROM pb.max_s) AS max_changed
       |FROM pa FULL OUTER JOIN pb ON pa.col_name = pb.col_name
       |ORDER BY col_name""".stripMargin
  }
}
