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
private[graft] trait QueriesFeatureStore { this: Queries.type =>
  /** q177: feature-snapshot extraction — the feature-store query a
    * churn/propensity model trains on: per user AS OF a cutoff,
    * trailing 7-day view/click counts, 30-day purchase revenue,
    * recency, and the FUTURE 14-day purchase label, all from one
    * conditional-aggregation scan (no label leakage: features read
    * strictly before the cutoff, the label strictly at/after).
    */
  def featureSnapshot(s: SparkSession, dir: String): DataFrame = {
    val cut = 1705449600000000000L // 2024-01-17T00:00:00Z nanos
    val d7 = 7L * 86400000000000L
    val d30 = 30L * 86400000000000L
    val d14 = 14L * 86400000000000L
    val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
      col("event_type"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    ev.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "view" && col("ts") < cut &&
          col("ts") >= cut - d7, 1L).otherwise(0L)).as("n_views_7d"),
        sum(when(col("event_type") === "click" && col("ts") < cut &&
          col("ts") >= cut - d7, 1L).otherwise(0L)).as("n_clicks_7d"),
        sum(when(col("event_type") === "purchase" && col("ts") < cut &&
          col("ts") >= cut - d30, col("cents")).otherwise(0L))
          .as("rev_30d_cents"),
        max(when(col("ts") < cut, col("ts"))).as("__last"),
        max(when(col("event_type") === "purchase" && col("ts") >= cut &&
          col("ts") < cut + d14, 1L).otherwise(0L)).as("label"))
      .where(col("__last").isNotNull)
      .withColumn("days_since_last",
        expr(s"(${cut}L - __last) DIV 86400000000000L"))
      .select(col("user_id"), col("n_views_7d"), col("n_clicks_7d"),
        col("rev_30d_cents"), col("days_since_last"), col("label"))
      .orderBy("user_id")
  }

  val featureSnapshotSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |c AS (SELECT 1705449600000000000 AS cut,
      |             604800000000000 AS d7,
      |             2592000000000000 AS d30,
      |             1209600000000000 AS d14),
      |agg AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type = 'view' AND ts < cut
      |          AND ts >= cut - d7 THEN 1 ELSE 0 END) AS n_views_7d,
      |    SUM(CASE WHEN event_type = 'click' AND ts < cut
      |          AND ts >= cut - d7 THEN 1 ELSE 0 END) AS n_clicks_7d,
      |    SUM(CASE WHEN event_type = 'purchase' AND ts < cut
      |          AND ts >= cut - d30 THEN cents ELSE 0 END)
      |      AS rev_30d_cents,
      |    MAX(CASE WHEN ts < cut THEN ts END) AS last_ts,
      |    MAX(CASE WHEN event_type = 'purchase' AND ts >= cut
      |          AND ts < cut + d14 THEN 1 ELSE 0 END) AS label
      |  FROM e CROSS JOIN c GROUP BY user_id, cut)
      |SELECT user_id, CAST(n_views_7d AS BIGINT) AS n_views_7d,
      |  CAST(n_clicks_7d AS BIGINT) AS n_clicks_7d,
      |  CAST(rev_30d_cents AS BIGINT) AS rev_30d_cents,
      |  CAST((cut - last_ts) // 86400000000000 AS BIGINT)
      |    AS days_since_last,
      |  CAST(label AS BIGINT) AS label
      |FROM agg CROSS JOIN c WHERE last_ts IS NOT NULL
      |ORDER BY user_id""".stripMargin

  /** q178: EXACT shingle-set similarity self-join
    * ([[SetSimJoin.shingleJaccardSelfPairs]]) — the corpus-wide exact
    * near-dup pair list at 3-shingle Jaccard ≥ 0.9: q18's metric with
    * certainty instead of MinHash recall. Shingle vocabulary is sparse
    * even on this dense-word corpus, so prefix buckets stay tiny.
    * Oracle: literal all-pairs shingle Jaccard.
    */
  def setsimShingle(s: SparkSession, dir: String): DataFrame =
    SetSimJoin.shingleJaccardSelfPairs(
        t(s, dir, "documents"), "doc_id", "text", shingleSize = 3,
        thresholdPpm = 900000L)
      .orderBy("id_a", "id_b")

  val setsimShingleSql: String =
    s"""WITH tokd AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |tok AS (SELECT doc_id, $duckShingles AS s FROM tokd),
       |tk AS (SELECT doc_id, s FROM tok WHERE len(s) >= 1),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
       |        CAST(len(a.s) + len(b.s)
       |             - len(list_intersect(a.s, b.s)) AS BIGINT) AS uni
       |      FROM tk a JOIN tk b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, inter, uni, (inter * 1000000) // uni AS jac_ppm
       |FROM p WHERE inter * 1000000 >= uni * 900000
       |ORDER BY id_a, id_b""".stripMargin

  /** The q177 feature snapshot as a DuckDB CTE body (shared by the
    * q179/q180 eval readouts so the three oracles cannot drift).
    */
  private[graft] def featureSnapshotCte: String =
    """feat AS (
      |  WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_type,
      |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |    FROM events),
      |  agg AS (
      |    SELECT user_id,
      |      SUM(CASE WHEN event_type = 'purchase'
      |            AND ts < 1705449600000000000
      |            AND ts >= 1705449600000000000 - 2592000000000000
      |            THEN cents ELSE 0 END) AS rev_30d_cents,
      |      MAX(CASE WHEN ts < 1705449600000000000 THEN ts END) AS last_ts,
      |      MAX(CASE WHEN event_type = 'purchase'
      |            AND ts >= 1705449600000000000
      |            AND ts < 1705449600000000000 + 1209600000000000
      |            THEN 1 ELSE 0 END) AS label
      |    FROM e GROUP BY user_id)
      |  SELECT user_id, rev_30d_cents, label FROM agg
      |  WHERE last_ts IS NOT NULL)""".stripMargin

  /** q179: calibration table ([[Stats.calibrationBins]]) over the q177
    * feature snapshot — does trailing 30-day revenue predict the
    * future-purchase label, read as observed positive rate per fixed
    * $1000 revenue bin. Oracle replays the snapshot, the clamped
    * integer binning, and the floor-ppm rates.
    */
  def calibrationRevenue(s: SparkSession, dir: String): DataFrame =
    Stats.calibrationBins(
        featureSnapshot(s, dir)
          .select(col("rev_30d_cents").cast("double").as("score"),
            (col("label") === 1L).as("lab")),
        Seq(), "score", "lab", binWidth = 10000L, maxBin = 9)
      .orderBy("bin")

  val calibrationRevenueSql: String =
    s"""WITH $featureSnapshotCte
       |SELECT least(greatest(CAST(floor(CAST(rev_30d_cents AS DOUBLE))
       |         AS BIGINT), 0) // 10000, 9) AS bin,
       |  COUNT(*) AS n,
       |  CAST(SUM(label) AS BIGINT) AS pos,
       |  CAST(SUM(label) * 1000000 // COUNT(*) AS BIGINT) AS pos_ppm
       |FROM feat GROUP BY 1 ORDER BY bin""".stripMargin

  /** q180: precision/recall operating points ([[Stats.prAtThresholds]])
    * for the same scorer — confusion counts + floor-ppm metrics at
    * four revenue thresholds. Oracle replays every cell.
    */
  def prSweepRevenue(s: SparkSession, dir: String): DataFrame =
    Stats.prAtThresholds(
        featureSnapshot(s, dir)
          .select(col("rev_30d_cents").as("score"),
            (col("label") === 1L).as("lab")),
        Seq(), "score", "lab",
        thresholds = Seq(0L, 50000L, 100000L, 200000L))
      .orderBy("threshold")

  val prSweepRevenueSql: String =
    s"""WITH $featureSnapshotCte,
       |t AS (SELECT unnest([0, 50000, 100000, 200000]) AS threshold),
       |cell AS (
       |  SELECT t.threshold,
       |    SUM(CASE WHEN rev_30d_cents >= threshold AND label = 1
       |        THEN 1 ELSE 0 END) AS tp,
       |    SUM(CASE WHEN rev_30d_cents >= threshold AND label = 0
       |        THEN 1 ELSE 0 END) AS fp,
       |    SUM(CASE WHEN rev_30d_cents < threshold AND label = 1
       |        THEN 1 ELSE 0 END) AS fn,
       |    SUM(CASE WHEN rev_30d_cents < threshold AND label = 0
       |        THEN 1 ELSE 0 END) AS tn
       |  FROM feat CROSS JOIN t GROUP BY 1)
       |SELECT CAST(threshold AS BIGINT) AS threshold,
       |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       |  CASE WHEN tp + fp > 0
       |    THEN CAST(tp * 1000000 // (tp + fp) AS BIGINT) END
       |    AS precision_ppm,
       |  CASE WHEN tp + fn > 0
       |    THEN CAST(tp * 1000000 // (tp + fn) AS BIGINT) END
       |    AS recall_ppm
       |FROM cell ORDER BY threshold""".stripMargin

  /** q181: bounded Bellman–Ford ([[Graph.shortestPathsK]]) — weighted
    * shortest distances from customers {1,2,3} over the q97
    * customer↔part graph with min-quantity edge weights, 4 relaxation
    * rounds. The oracle unrolls all 4 rounds in MATERIALIZED CTEs.
    */
  def shortestPaths(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val fwd = l.join(broadcast(o), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).as("dst"))
      .agg(min(col("l_quantity").cast("long")).as("w"))
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    graft.operators.Graph.shortestPathsK(edges, Seq(1L, 2L, 3L), rounds = 4)
      .orderBy("node")
  }

  val shortestPathsSql: String = {
    def round(i: Int) =
      s"""d$i AS MATERIALIZED (
         |  SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, d${i - 1}.dist + e.w AS dist
         |    FROM d${i - 1} JOIN eb e ON d${i - 1}.node = e.src)
         |  GROUP BY node)""".stripMargin
    s"""WITH fwd AS (
       |  SELECT CAST(o.o_custkey AS BIGINT) AS src,
       |    CAST(l.l_partkey + 10000000 AS BIGINT) AS dst,
       |    CAST(MIN(l.l_quantity) AS BIGINT) AS w
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  GROUP BY 1, 2),
       |eb AS MATERIALIZED (SELECT src, dst, w FROM fwd
       |      UNION ALL SELECT dst, src, w FROM fwd),
       |d0 AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
       |       (2, 0), (3, 0)) v(node, dist)),
       |${round(1)}, ${round(2)}, ${round(3)}, ${round(4)}
       |SELECT node, dist FROM d4 ORDER BY node""".stripMargin
  }

  /** q182: Spearman rank correlation ([[Stats.spearman]]) of quantity
    * vs extended price per return flag — the monotone-association
    * screen that is robust where q111's Pearson is not. Rank-based =
    * scale-free, so the oracle replays the doubled-midrank integers
    * (2·rank + ties − 1, the q173 quantity), the HUGEINT power sums,
    * and the one sqrt/divide double chain.
    */
  def spearmanLineitem(s: SparkSession, dir: String): DataFrame =
    Stats.spearman(t(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag")

  val spearmanLineitemSql: String =
    """WITH r0 AS (SELECT l_returnflag AS g, l_quantity AS x,
      |    l_extendedprice AS y
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |rk AS (SELECT g,
      |    CAST(2 * RANK() OVER (PARTITION BY g ORDER BY x ASC)
      |      + COUNT(*) OVER (PARTITION BY g, x) - 1 AS HUGEINT) AS ax,
      |    CAST(2 * RANK() OVER (PARTITION BY g ORDER BY y ASC)
      |      + COUNT(*) OVER (PARTITION BY g, y) - 1 AS HUGEINT) AS ay
      |  FROM r0),
      |m AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(ax) AS sx, SUM(ay) AS sy,
      |    SUM(ax * ax) AS sxx, SUM(ay * ay) AS syy,
      |    SUM(ax * ay) AS sxy
      |  FROM rk GROUP BY g)
      |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
      |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
      |    CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
      |      / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
      |             * CAST(n * syy - sy * sy AS DOUBLE))
      |      * 1000000.0) AS BIGINT) END AS rho_e6
      |FROM m ORDER BY g""".stripMargin

  /** q183: Kendall tau-b ([[Stats.kendallTau]]) between daily shipped
    * quantity and daily revenue per return flag — concordance over the
    * day-grain series (the operator's aggregate-grain contract; the
    * O(n²) pair scan is the statistic's definition). Every pair
    * comparison is on exact int64 day sums, so C/D/tie counts replay
    * literally; tau closes with one sqrt/divide on doubles.
    */
  def kendallDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("qty"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("rev_cents"))
    Stats.kendallTau(daily, Seq("l_returnflag"), "day", "qty", "rev_cents")
      .orderBy("l_returnflag")
  }

  val kendallDailySql: String =
    """WITH d AS (SELECT l_returnflag AS g, CAST(l_shipdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS x,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (SELECT a.g,
      |    COUNT(*) AS n0,
      |    SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
      |          OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS c,
      |    SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
      |          OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS d,
      |    SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS tx,
      |    SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS ty
      |  FROM d a JOIN d b ON a.g = b.g AND a.day < b.day
      |  GROUP BY a.g)
      |SELECT g AS l_returnflag, CAST(n0 AS BIGINT) AS n_pairs,
      |  CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
      |  CASE WHEN n0 - tx > 0 AND n0 - ty > 0 THEN
      |    CAST(FLOOR(CAST(c - d AS DOUBLE)
      |      / SQRT(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))
      |      * 1000000.0) AS BIGINT) END AS tau_e6
      |FROM p ORDER BY g""".stripMargin

  /** q184: autocorrelation function ([[Stats.acf]]) of daily revenue
    * at lags 1..7 per return flag — the seasonality diagnostic, in
    * exact n²-scaled integers: every centered term (n·x_t − S) is a
    * HUGEINT the oracle reproduces digit-for-digit; only the closing
    * num/den ratio touches doubles. Positional index from a day-grain
    * row_number, so gaps in the ship calendar pack (documented
    * semantics — pass calendar days for gap-aware lags instead).
    */
  def acfDailyRevenue(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("rev"))
    val idx = daily.withColumn("idx",
      row_number().over(
        Window.partitionBy("l_returnflag").orderBy("day")).cast("long"))
    Stats.acf(idx, Seq("l_returnflag"), "idx", "rev", maxLag = 7)
      .orderBy("l_returnflag", "lag")
  }

  val acfDailyRevenueSql: String =
    """WITH d AS (SELECT l_returnflag AS g, CAST(l_shipdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1, 2),
      |ix AS (SELECT g, v,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY day) AS idx FROM d),
      |tot AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
      |    CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS s
      |  FROM ix GROUP BY g),
      |c AS (SELECT ix.g, ix.idx,
      |    tot.n * CAST(ix.v AS HUGEINT) - tot.s AS cv, tot.n
      |  FROM ix JOIN tot USING (g)),
      |den AS (SELECT g, SUM(cv * cv) AS dd, CAST(MAX(n) AS BIGINT) AS n
      |  FROM c GROUP BY g),
      |num AS (SELECT a.g, l.lag, COUNT(*) AS n_pairs,
      |    SUM(a.cv * b.cv) AS nm
      |  FROM c a
      |  CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) l(lag)
      |  JOIN c b ON b.g = a.g AND b.idx = a.idx + l.lag
      |  GROUP BY a.g, l.lag)
      |SELECT num.g AS l_returnflag, CAST(num.lag AS BIGINT) AS lag,
      |  CAST(num.n_pairs AS BIGINT) AS n_pairs, den.n,
      |  CASE WHEN den.dd > 0 THEN
      |    CAST(FLOOR(CAST(num.nm AS DOUBLE) / CAST(den.dd AS DOUBLE)
      |      * 1000000.0) AS BIGINT) END AS acf_e6
      |FROM num JOIN den USING (g) ORDER BY 1, 2""".stripMargin

  /** q185: HITS hubs & authorities ([[graft.operators.Graph.hits]], 3
    * iterations, L1-normalized integer scores) over the DIRECTED
    * customer→part purchase graph — which parts are bought by
    * important customers, and which customers buy important parts.
    * The oracle unrolls every half-step (inflow sum, one-row total,
    * floor-div normalization) as MATERIALIZED CTEs. Top 20 authorities.
    */
  def hitsParts(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val edges = l.join(broadcast(o), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).as("dst"))
    graft.operators.Graph.hits(edges, iterations = 3)
      .orderBy(col("auth").desc, col("id").asc).limit(20)
  }

  val hitsPartsSql: String = {
    // one normalized half-step: inflow over the join key, then the L1
    // integer normalization against the one-row total (the operator's
    // halfStep, verbatim)
    def half(inTbl: String, inCol: String, joinKey: String,
        outKey: String, outTbl: String, outCol: String) =
      s"""${outTbl}p AS MATERIALIZED (
         |  SELECT e.$outKey AS id, SUM(t.$inCol) AS s
         |  FROM e JOIN $inTbl t ON e.$joinKey = t.id GROUP BY e.$outKey),
         |$outTbl AS MATERIALIZED (
         |  SELECT n.id, CASE WHEN tt.t > 0
         |    THEN (COALESCE(p.s, 0) * 1000000) // tt.t ELSE 0 END AS $outCol
         |  FROM nodes n LEFT JOIN ${outTbl}p p ON p.id = n.id
         |  CROSS JOIN (SELECT SUM(s) AS t FROM ${outTbl}p) tt)""".stripMargin
    val steps = (1 to 3).map { i =>
      half(s"h${i - 1}", "hub", "src", "dst", s"a$i", "auth") + ",\n" +
        half(s"a$i", "auth", "dst", "src", s"h$i", "hub")
    }.mkString(",\n")
    s"""WITH fwd AS (
       |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
       |    CAST(l.l_partkey + 10000000 AS BIGINT) AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |e AS MATERIALIZED (SELECT src, dst FROM fwd),
       |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
       |  (SELECT src AS id FROM e UNION SELECT dst FROM e)),
       |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS hub FROM nodes),
       |$steps
       |SELECT CAST(h3.id AS BIGINT) AS id, CAST(h3.hub AS BIGINT) AS hub,
       |  CAST(a3.auth AS BIGINT) AS auth
       |FROM h3 JOIN a3 ON a3.id = h3.id
       |ORDER BY a3.auth DESC, h3.id ASC LIMIT 20""".stripMargin
  }

  /** q186: the TPC-H Q21 "waiting suppliers" SHAPE — suppliers who
    * were the SOLE late shipper on a finished multi-supplier order
    * (late = shipped > 60 days after the order date; the schema has no
    * commit/receipt dates, so the ship-lag screen stands in). One
    * semi-join (another supplier exists on the order) + one anti-join
    * (no OTHER supplier was late) over the distinct (order, supplier)
    * late set — the classic exists/not-exists decorrelation pattern,
    * entirely engine-native on both sides.
    */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("odate"))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        to_date(col("l_shipdate")).as("sdate"))
    val late = l.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
      .where(col("sdate") > date_add(col("odate"), 60))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val others = l
      .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      .distinct()
    val multi = late.join(others,
      col("o2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"),
      "left_semi")
    val lateOthers = late
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    val sole = multi.join(lateOthers,
      col("o3") === col("l_orderkey") && col("s3") =!= col("l_suppkey"),
      "left_anti")
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
    sole.groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(sup), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc).limit(20)
  }

  val waitingSuppliersSql: String =
    """WITH late AS (
      |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |    AND CAST(l.l_shipdate AS DATE) >
      |        CAST(o.o_orderdate AS DATE) + 60),
      |cand AS (
      |  SELECT lt.l_orderkey, lt.l_suppkey FROM late lt
      |  WHERE EXISTS (
      |      SELECT 1 FROM lineitem l2
      |      WHERE l2.l_orderkey = lt.l_orderkey
      |        AND l2.l_suppkey <> lt.l_suppkey)
      |    AND NOT EXISTS (
      |      SELECT 1 FROM late l3
      |      WHERE l3.l_orderkey = lt.l_orderkey
      |        AND l3.l_suppkey <> lt.l_suppkey))
      |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM cand c JOIN supplier s ON s.s_suppkey = c.l_suppkey
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s_name ASC LIMIT 20""".stripMargin

  /** q187: the hashing trick ([[graft.operators.Encoding.hashFeatures]])
    * — documents' whitespace tokens folded into 32 signed hash buckets,
    * the vocabulary-free sparse encoder. Hash = the repo's one portable
    * salted md5, so the oracle replays every bucket, sign, and summed
    * weight byte-for-byte.
    */
  def featureHashDocs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Encoding.hashFeatures(
        t(s, dir, "documents").where(col("text").isNotNull),
        "doc_id", graft.functions.TextFunctions.tokens(col("text")),
        nBuckets = 32)
      .orderBy("doc_id", "bucket")

  val featureHashDocsSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS tk
       |  FROM documents WHERE text IS NOT NULL),
       |h AS (SELECT doc_id, ${duckHash60("feat", "tk")} AS hv FROM tok)
       |SELECT doc_id, hv % 32 AS bucket,
       |  CAST(SUM(CASE WHEN (hv // 32) % 2 = 0 THEN 1 ELSE -1 END)
       |    AS BIGINT) AS weight
       |FROM h GROUP BY doc_id, bucket
       |ORDER BY doc_id, bucket""".stripMargin

  /** q188: deterministic bootstrap CI ([[Stats.bootstrapMeanCI]],
    * 200 resamples) for mean daily order revenue per priority — the
    * uncertainty band a metrics report ships with. Every draw is the
    * content-addressed `md5 mod n` pick, every resample mean a
    * floor-milli integer, the CI bounds nearest-rank members — the
    * oracle replays the full 200×n grid digit-for-digit.
    */
  def bootstrapDailyRevenue(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
    val idx = daily.withColumn("idx",
      (row_number().over(Window.partitionBy("o_orderpriority")
        .orderBy("day")) - 1).cast("long"))
    Stats.bootstrapMeanCI(idx, Seq("o_orderpriority"), "idx", "rev",
        nResamples = 200)
      .orderBy("o_orderpriority")
  }

  val bootstrapDailyRevenueSql: String = {
    val key = "concat_ws(chr(2), g, CAST(b AS VARCHAR), CAST(idx AS VARCHAR))"
    s"""WITH daily AS (SELECT o_orderpriority AS g,
       |    CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS rev
       |  FROM orders GROUP BY 1, 2),
       |ix AS (SELECT g, rev,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY day) - 1
       |      AS BIGINT) AS idx
       |  FROM daily),
       |base AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(rev) AS BIGINT) AS s FROM ix GROUP BY g),
       |grid AS (SELECT ix.g, ix.idx, b.b, base.n
       |  FROM ix JOIN base USING (g)
       |  CROSS JOIN (SELECT unnest(range(1, 201)) AS b) b),
       |draws AS (SELECT g, b, n,
       |    ${duckHash60("boot", key)} % n AS target FROM grid),
       |picked AS (SELECT d.g, d.b, ix.rev, d.n FROM draws d
       |  JOIN ix ON ix.g = d.g AND ix.idx = d.target),
       |means AS (SELECT g, b,
       |    CAST((1000 * SUM(rev)) // MAX(n) AS BIGINT) AS bm
       |  FROM picked GROUP BY g, b),
       |rk AS (SELECT g, b, bm,
       |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY bm ASC, b ASC) AS r
       |  FROM means)
       |SELECT base.g AS o_orderpriority, base.n,
       |  CAST((1000 * base.s) // base.n AS BIGINT) AS obs_mean_milli,
       |  lo.bm AS ci_lo_milli, hi.bm AS ci_hi_milli,
       |  CAST(200 AS BIGINT) AS b_resamples
       |FROM base
       |JOIN (SELECT g, bm FROM rk WHERE r = 5) lo USING (g)
       |JOIN (SELECT g, bm FROM rk WHERE r = 195) hi USING (g)
       |ORDER BY 1""".stripMargin
  }

  /** q189: deterministic permutation test ([[Stats.permutationTest]],
    * 100 permutations) — does weekend daily order revenue differ from
    * weekday? Exact integer statistic, md5-ranked relabelings, add-one
    * p-value; the oracle replays all 100 permutations including the
    * rank-window tie rule.
    */
  def permTestWeekend(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
      .withColumn("weekend", dayofweek(col("day")).isin(1, 7))
    Stats.permutationTest(daily, Seq.empty, "day", "weekend", "rev",
      nPerms = 100)
  }

  val permTestWeekendSql: String = {
    val key = "concat_ws(chr(2), CAST(b AS VARCHAR), CAST(day AS VARCHAR))"
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS rev
       |  FROM orders GROUP BY 1),
       |lab AS (SELECT day, rev, dayofweek(day) IN (0, 6) AS we FROM daily),
       |base AS (SELECT
       |    CAST(SUM(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(SUM(CASE WHEN we THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN we THEN rev ELSE 0 END) AS BIGINT) AS sa,
       |    CAST(SUM(CASE WHEN we THEN 0 ELSE rev END) AS BIGINT) AS sb
       |  FROM lab),
       |grid AS (SELECT l.day, l.rev, b.b FROM lab l
       |  CROSS JOIN (SELECT unnest(range(1, 101)) AS b) b),
       |h AS (SELECT day, rev, b, ${duckHash60("perm", key)} AS hv
       |  FROM grid),
       |rk AS (SELECT b, day, rev,
       |    ROW_NUMBER() OVER (PARTITION BY b ORDER BY hv ASC, day ASC)
       |      AS r
       |  FROM h),
       |perms AS (SELECT rk.b,
       |    CAST((1000 * SUM(CASE WHEN rk.r <= base.n_a THEN rk.rev
       |        ELSE 0 END)) // MAX(base.n_a) AS BIGINT)
       |    - CAST((1000 * SUM(CASE WHEN rk.r > base.n_a THEN rk.rev
       |        ELSE 0 END)) // MAX(base.n_b) AS BIGINT) AS d
       |  FROM rk CROSS JOIN base GROUP BY rk.b),
       |obs AS (SELECT CAST((1000 * sa) // n_a AS BIGINT)
       |    - CAST((1000 * sb) // n_b AS BIGINT) AS od FROM base),
       |ext AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_extreme
       |  FROM perms CROSS JOIN obs WHERE abs(perms.d) >= abs(obs.od))
       |SELECT base.n_a, base.n_b, obs.od AS obs_diff_milli,
       |  CASE WHEN obs.od IS NOT NULL THEN ext.n_extreme END
       |    AS n_extreme,
       |  CASE WHEN obs.od IS NOT NULL THEN
       |    CAST(((1 + ext.n_extreme) * 1000000) // 101 AS BIGINT) END
       |    AS p_ppm
       |FROM base CROSS JOIN obs CROSS JOIN ext""".stripMargin
  }

  /** q190: the k-modes ELBOW sweep — mean Hamming cost vs k ∈
    * {2, 4, 8}, each a full portable-init Lloyd fit (maxIter 5, seed
    * 42) — the model-selection readout every user of the reference
    * library produces before settling on k `[UP fit() k param]`. The
    * oracle replays ALL THREE fits via [[lloydReplaySql]] (cost form:
    * the weighted assignment distance at the final centers), unioned.
    */
  def kmodesElbow(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "orders").select(orderFeatures.as("features"))
    Seq(2, 4, 8).map { k =>
      val model = new KModes().setK(k).setMaxIter(5).setSeed(42L)
        .setInitHash("md5").fit(df)
      val cLit = typedlit(model.clusterCenters.map(_.toSeq).toSeq)
      df.select(Distances.assign(col("features"), cLit)
          .getField("min_dist").as("d"))
        .agg(count(lit(1)).as("__n"), sum(col("d")).as("__s"))
        .select(lit(k).as("k"),
          round(col("__s").cast("double") / col("__n"), 6).as("mean_cost"))
    }.reduce(_ unionByName _).orderBy("k")
  }

  val kmodesElbowSql: String =
    Seq(2, 4, 8).map { k =>
      val fin = s"SELECT CAST($k AS INTEGER) AS k,\n" +
        "  round(CAST(SUM(w * d) AS DOUBLE) / SUM(w), 6) AS mean_cost\n" +
        "FROM afin WHERE rn = 1"
      "SELECT * FROM (" +
        lloydReplaySql("orders", orderFeaturesSqlCols, k, maxIter = 5,
          seed = 42L, finalSelect = fin) + ")"
    }.mkString("\nUNION ALL\n") + "\nORDER BY k"

  /** q191: REAL audio decode + exact autocorrelation periodicity
    * ([[Multimodal.audioPeriodicity]]): per document a mono 16-bit PCM
    * WAV is synthesized from a pure integer sample formula
    * (s_t = ((id·31 + 7t²) mod 4096) − 2048), encoded through
    * [[Multimodal.encodeWav]], decoded back by the byte-level RIFF
    * parser, and reduced to integer autocorrelation R(k), k ∈ [1, 8] —
    * best lag, best R, and energy R(0). The oracle replays the sample
    * formula and every R(k) digit-for-digit (the q57 pixel-formula
    * pattern, applied to audio): a decoder bug — wrong endianness, an
    * off-by-one in the chunk walk — changes the integers and fails the
    * hash loudly.
    */

  def wavPeriodicity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(Fixtures.wavAssetFor _)
    Multimodal.audioPeriodicity(assets, lagMin = 1, lagMax = 8)
      .orderBy("asset_id")
  }

  val wavPeriodicitySql: String =
    """WITH ids AS (SELECT doc_id AS id,
      |    CAST(64 + doc_id % 32 AS BIGINT) AS n FROM documents),
      |smp AS (SELECT id, n, t,
      |    ((id * 31 + 7 * t * t) % 4096) - 2048 AS s
      |  FROM ids CROSS JOIN (SELECT unnest(range(0, 96)) AS t) ts
      |  WHERE t < n),
      |e0 AS (SELECT id, CAST(SUM(s * s) AS BIGINT) AS r0
      |  FROM smp GROUP BY id),
      |lagr AS (SELECT a.id, k.k, CAST(SUM(a.s * b.s) AS BIGINT) AS r
      |  FROM smp a CROSS JOIN (SELECT unnest(range(1, 9)) AS k) k
      |  JOIN smp b ON b.id = a.id AND b.t = a.t + k.k
      |  GROUP BY a.id, k.k),
      |best AS (SELECT id, k AS best_lag, r AS r_best,
      |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY r DESC, k ASC)
      |      AS rn
      |  FROM lagr)
      |SELECT i.id AS asset_id, i.n AS n_samples,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(b.best_lag AS BIGINT) AS best_lag, b.r_best, e0.r0
      |FROM ids i JOIN best b ON b.id = i.id AND b.rn = 1
      |JOIN e0 ON e0.id = i.id
      |ORDER BY asset_id""".stripMargin

  /** q240: AUDIO corpus dedup by DECODED content — completes the
    * modality sweep (text q16, video q237, audio here): each clip's
    * identity is (sample count, Σs, Σs²) over the samples the RIFF
    * parser actually decodes, so re-encoded byte-level noise cannot
    * split a group and a decoder regression (endianness, chunk-walk
    * off-by-one) changes the sums and fails the hash loudly. Fixture
    * plants duplicates (assets from `doc_id % 200`); the oracle replays
    * the integer sample formula per class — no golden table needed,
    * PCM is lossless. One narrow decode + one aggregation, no pairs.
    */
  def audioDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaAsset(id, "audio",
        Fixtures.wavAssetFor(id % 200).media))
    val sig = assets.mapPartitions { it =>
      it.flatMap { a =>
        Multimodal.decodeWavSamples(a.media).map { case (_, samples) =>
          var s1 = 0L; var s2 = 0L
          samples.foreach { v => s1 += v; s2 += v.toLong * v }
          (a.asset_id, samples.length.toLong, s1, s2)
        }
      }
    }.toDF("asset_id", "n_samples", "s1", "s2")
    sig.groupBy(col("n_samples"), col("s1"), col("s2"))
      .agg(min(col("asset_id")).as("rep_id"),
        count(lit(1)).as("n_copies"))
      .select(col("rep_id"), col("n_copies"), col("n_samples"))
      .orderBy("rep_id")
  }

  val audioDedupSql: String =
    """WITH d AS (SELECT doc_id, doc_id % 200 AS gid FROM documents),
      |cls AS (SELECT DISTINCT gid FROM d),
      |t AS (SELECT gid, unnest(range(0, 64 + gid % 32)) AS t FROM cls),
      |sig AS (SELECT gid, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(((gid * 31 + 7 * t * t) % 4096) - 2048) AS BIGINT)
      |      AS s1,
      |    CAST(SUM((((gid * 31 + 7 * t * t) % 4096) - 2048)
      |      * (((gid * 31 + 7 * t * t) % 4096) - 2048)) AS BIGINT) AS s2
      |  FROM t GROUP BY gid),
      |ds AS (SELECT d.doc_id, s.n, s.s1, s.s2
      |  FROM d JOIN sig s ON s.gid = d.gid)
      |SELECT MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_copies,
      |  MIN(n) AS n_samples
      |FROM ds GROUP BY n, s1, s2 ORDER BY rep_id""".stripMargin

  /** q242: PERCEPTUAL audio dedup — the modality twin of q241's image
    * dHash, closing the gap q240 leaves open: a volume-scaled copy
    * (every sample × c) has different samples and a different
    * (n, Σs, Σs²), so q240's exact signature SPLITS it; the
    * amplitude-normalized quantized energy envelope
    * ([[Multimodal.energyEnvelope]]: 8 windows, scale 1000) is
    * EXACTLY invariant under scaling (c² cancels inside the floor), so
    * scaled copies collide with no Hamming tolerance needed — grouping
    * stays the one-aggregation q240 shape, no pair enumeration. The
    * fixture plants each of [[Fixtures.AudioEnvClasses]] clip classes
    * at amplitudes ×1/×2/×3 ([[Fixtures.wavScaledAssetFor]]); the
    * engine decodes REAL RIFF bytes while the oracle replays the
    * integer sample formula, window split (t·8/n), per-window Σs², and
    * the ⌊E_w·1000/ΣE⌋ quantization — PCM is lossless and every step
    * is integer-exact, so no golden table is needed (the q240
    * rationale, extended through the envelope arithmetic).
    */
  def audioEnvelopeDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaAsset(id, "audio",
        Fixtures.wavScaledAssetFor(id).media))
    val sig = assets.mapPartitions { it =>
      it.flatMap { a =>
        Multimodal.decodeWavSamples(a.media).map { case (_, samples) =>
          val env = Multimodal.energyEnvelope(samples, windows = 8,
            scale = 1000L)
          (a.asset_id, samples.length.toLong, env.mkString("|"))
        }
      }
    }.toDF("asset_id", "n_samples", "env")
    sig.groupBy(col("n_samples"), col("env"))
      .agg(min(col("asset_id")).as("rep_id"),
        count(lit(1)).as("n_copies"))
      .select(col("rep_id"), col("n_copies"), col("n_samples"))
      .orderBy("rep_id")
  }

  val audioEnvelopeDedupSql: String =
    """WITH d AS (SELECT doc_id, doc_id % 150 AS gid,
      |    CAST((doc_id // 150) % 3 + 1 AS BIGINT) AS amp FROM documents),
      |cls AS (SELECT DISTINCT gid, amp FROM d),
      |smp AS (SELECT gid, amp, t, 64 + gid % 32 AS n,
      |    amp * (((gid * 31 + 7 * t * t) % 4096) - 2048) AS s
      |  FROM cls CROSS JOIN (SELECT unnest(range(0, 96)) AS t) ts
      |  WHERE t < 64 + gid % 32),
      |win AS (SELECT gid, amp, n, (t * 8) // n AS w,
      |    CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS ew
      |  FROM smp GROUP BY gid, amp, n, (t * 8) // n),
      |tot AS (SELECT gid, amp, n, w, ew,
      |    SUM(ew) OVER (PARTITION BY gid, amp) AS etot FROM win),
      |env AS (SELECT gid, amp, MIN(n) AS n,
      |    string_agg(CAST((ew * 1000) // etot AS VARCHAR), '|'
      |      ORDER BY w) AS env
      |  FROM tot GROUP BY gid, amp),
      |ds AS (SELECT d.doc_id, e.n, e.env
      |  FROM d JOIN env e ON e.gid = d.gid AND e.amp = d.amp)
      |SELECT MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_copies,
      |  CAST(MIN(n) AS BIGINT) AS n_samples
      |FROM ds GROUP BY n, env ORDER BY rep_id""".stripMargin

  /** q246: CROSS-SAMPLE-RATE audio dedup — the audio sibling of q244's
    * cross-format image identity, closing the re-encode gap q242
    * leaves open: q242 collapses amplitude-scaled copies at ONE rate,
    * but the same clip resampled (8 kHz master shipped as 16/32 kHz
    * zero-order-hold re-encodes — [[Fixtures.wavRateAssetFor]]) has
    * different bytes, different n_samples, and a different sample_rate
    * header, so every exact signature splits it. The energy envelope is
    * TIME-normalized (window = t·W/n spans the clip regardless of n),
    * and with the fixture's window-aligned base length a repeat-group
    * never straddles a window: E_w and ΣE both scale by exactly r, the
    * quantization floors the same rational, and re-encodes collide
    * EXACTLY — so grouping on (duration_ms, envelope) stays the
    * one-aggregation q242 shape, with `n_rates` pinning that every
    * class collapsed across all three rates. The oracle replays the
    * BASE clip's integer formula only (window split, Σs², ⌊E_w·1000/ΣE⌋)
    * — deliberately: if the engine's upsampled envelopes ever drifted
    * from the base's, the hash compare would catch it.
    */
  def audioRateDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => Fixtures.wavRateAssetFor(id))
    val sig = assets.mapPartitions { it =>
      it.flatMap { a =>
        Multimodal.decodeWavSamples(a.media).map { case (info, samples) =>
          val env = Multimodal.energyEnvelope(samples, windows = 8,
            scale = 1000L)
          (a.asset_id, samples.length.toLong * 1000L / info.sampleRate,
            info.sampleRate.toLong, env.mkString("|"))
        }
      }
    }.toDF("asset_id", "duration_ms", "sample_rate", "env")
    sig.groupBy(col("duration_ms"), col("env"))
      .agg(min(col("asset_id")).as("rep_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("sample_rate")).as("n_rates"))
      .select(col("rep_id"), col("n_copies"), col("n_rates"),
        col("duration_ms"))
      .orderBy("rep_id")
  }

  val audioRateDedupSql: String =
    """WITH d AS (SELECT doc_id, doc_id % 150 AS gid,
      |    CAST(8000 * (1 << ((doc_id // 150) % 3)) AS BIGINT) AS rate
      |  FROM documents),
      |cls AS (SELECT DISTINCT gid FROM d),
      |smp AS (SELECT gid, t, 64 + 8 * (gid % 5) AS n,
      |    ((gid * 37 + 11 * t * t) % 4096) - 2048 AS s
      |  FROM cls CROSS JOIN (SELECT unnest(range(0, 96)) AS t) ts
      |  WHERE t < 64 + 8 * (gid % 5)),
      |win AS (SELECT gid, n, (t * 8) // n AS w,
      |    CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS ew
      |  FROM smp GROUP BY gid, n, (t * 8) // n),
      |tot AS (SELECT gid, n, w, ew,
      |    SUM(ew) OVER (PARTITION BY gid) AS etot FROM win),
      |env AS (SELECT gid, MIN(n) // 8 AS duration_ms,
      |    string_agg(CAST((ew * 1000) // etot AS VARCHAR), '|'
      |      ORDER BY w) AS env
      |  FROM tot GROUP BY gid),
      |ds AS (SELECT d.doc_id, d.rate, e.duration_ms, e.env
      |  FROM d JOIN env e ON e.gid = d.gid)
      |SELECT MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_copies,
      |  CAST(COUNT(DISTINCT rate) AS BIGINT) AS n_rates,
      |  CAST(MIN(duration_ms) AS BIGINT) AS duration_ms
      |FROM ds GROUP BY duration_ms, env ORDER BY rep_id""".stripMargin

  /** q192: vocabulary drift ([[TextAnalysis.vocabDiff]]) between two
    * corpus snapshots (even vs odd doc ids as stand-in releases) —
    * per-term df and floor-ppm share deltas with new/vanished/grown/
    * shrunk statuses, top 100 by absolute share change. The oracle
    * replays tokenization, both df counts, the full-outer merge, the
    * minDf prune, and every ppm division.
    */
  def vocabDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.vocabDiff(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", minDf = 3L)
      .orderBy(abs(col("delta_ppm")).desc, col("term").asc)
      .limit(100)
  }

  val vocabDriftSql: String =
    s"""WITH ta AS (SELECT doc_id, unnest(list_distinct($duckToks)) AS term
       |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
       |tb AS (SELECT doc_id, unnest(list_distinct($duckToks)) AS term
       |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1),
       |a AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_a
       |  FROM ta GROUP BY term),
       |b AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_b
       |  FROM tb GROUP BY term),
       |na AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
       |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
       |nb AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
       |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1),
       |j AS (SELECT COALESCE(a.term, b.term) AS term,
       |    COALESCE(df_a, 0) AS df_a, COALESCE(df_b, 0) AS df_b
       |  FROM a FULL OUTER JOIN b ON a.term = b.term),
       |sel AS (SELECT term, df_a, df_b,
       |    CAST(df_a * 1000000 // na.n AS BIGINT) AS share_a_ppm,
       |    CAST(df_b * 1000000 // nb.n AS BIGINT) AS share_b_ppm
       |  FROM j CROSS JOIN na CROSS JOIN nb
       |  WHERE GREATEST(df_a, df_b) >= 3)
       |SELECT term, df_a, df_b, share_a_ppm, share_b_ppm,
       |  share_b_ppm - share_a_ppm AS delta_ppm,
       |  CASE WHEN df_a = 0 THEN 'new' WHEN df_b = 0 THEN 'vanished'
       |       WHEN share_b_ppm - share_a_ppm >= 0 THEN 'grown'
       |       ELSE 'shrunk' END AS status
       |FROM sel
       |ORDER BY abs(share_b_ppm - share_a_ppm) DESC, term ASC
       |LIMIT 100""".stripMargin

  /** q193: the TPC-H Q17 "small-quantity-order revenue" SHAPE — the
    * correlated aggregate subquery (lineitems below 50% of their
    * part's average quantity), decorrelated the way every engine
    * executes it: per-part averages as a map-side-combined aggregate
    * joined back to the facts. The average comparison stays EXACT:
    * `5 · qty · n < Σqty · 10` on integer quantities — no float
    * threshold an engine could round differently. DECIMAL revenue sum.
    */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"), floor(col("l_quantity")).cast("long").as("qty"),
        col("l_extendedprice"))
    val avgq = l.groupBy(col("l_partkey").as("__pk"))
      .agg(count(lit(1)).as("__n"), sum(col("qty")).as("__sq"))
    l.join(avgq, col("l_partkey") === col("__pk"))
      // qty < 0.5 * avg  ⟺  10·qty·n < 5·Σqty  (integers only)
      .where(col("qty") * 10 * col("__n") < col("__sq") * 5)
      .agg(count(lit(1)).as("n_small"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("revenue"))
  }

  val smallQtyRevenueSql: String =
    """WITH l AS (SELECT l_partkey,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS qty, l_extendedprice
      |  FROM lineitem),
      |a AS (SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(qty) AS BIGINT) AS sq
      |  FROM l GROUP BY 1)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
      |    AS DECIMAL(18,2)) AS revenue
      |FROM l JOIN a ON a.pk = l.l_partkey
      |WHERE l.qty * 10 * a.n < a.sq * 5""".stripMargin

  /** q194: seasonal-naive forecast backtest — the baseline every
    * forecasting system must beat, evaluated leakage-free: forecast for
    * day d is the actual at d−7 (same weekday last week); the report is
    * per-priority MAE and bias over the days with a 7-back actual, in
    * exact floor-milli cents. Calendar-aware: the 7-day lag is a DATE
    * join, not a row offset, so ship-calendar gaps produce no phantom
    * pairs. One day-grain aggregate, one self-equi-join on (group,
    * day−7), one closing aggregate.
    */
  def snaiveBacktest(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("g"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
    val lagged = daily.select(col("g").as("__g"),
      col("day").as("__d"), col("rev").as("prev"))
    daily.join(lagged,
        col("g") === col("__g") && col("__d") === date_sub(col("day"), 7))
      .groupBy(col("g").as("o_orderpriority"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("rev") - col("prev"))).as("__sae"),
        sum(col("rev") - col("prev")).as("__sbias"))
      .withColumn("mae_milli", expr("(1000L * __sae) div n_days"))
      // bias can be negative: floor via double (the q160 signed rule)
      .withColumn("bias_milli",
        floor(col("__sbias").cast("double") * 1000.0 /
          col("n_days").cast("double")).cast("long"))
      .drop("__sae", "__sbias")
      .orderBy("o_orderpriority")
  }

  val snaiveBacktestSql: String =
    """WITH d AS (SELECT o_orderpriority AS g,
      |    CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM orders GROUP BY 1, 2)
      |SELECT d.g AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST((1000 * SUM(abs(d.rev - p.rev))) // COUNT(*) AS BIGINT)
      |    AS mae_milli,
      |  CAST(FLOOR(CAST(SUM(d.rev - p.rev) AS DOUBLE) * 1000.0
      |    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS bias_milli
      |FROM d JOIN d p ON p.g = d.g AND p.day = d.day - 7
      |GROUP BY d.g ORDER BY d.g""".stripMargin

  /** q195: per-state dwell time — for each event, the gap to the SAME
    * user's next event (int64-nanos subtraction, (ts, event_id) tie
    * order), attributed to the event's type and reduced to exact
    * floor-milli totals/means — "how long do users sit in each state",
    * the time-in-state readout behind session quality and UI funnels.
    * One user-partitioned window + one map-side-combined aggregation.
    */
  def dwellTime(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("__next", lead(col("ts"), 1).over(w))
      .where(col("__next").isNotNull)
      // gap in MICROS before summing: an int64 NANO sum is
      // Σ_users(user activity span) and overflows at ~10k user-years;
      // micros buys 1000x headroom and ms outputs lose nothing
      .withColumn("__d", expr("(__next - ts) div 1000L"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"), sum(col("__d")).as("__sd"))
      .withColumn("total_ms", expr("__sd div 1000L"))
      .withColumn("mean_ms", expr("__sd div (1000L * n_intervals)"))
      .drop("__sd")
      .orderBy("event_type")
  }

  val dwellTimeSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    epoch_ns(ts) AS tns FROM events),
      |nx AS (SELECT event_type, tns,
      |    LEAD(tns) OVER (PARTITION BY user_id
      |                    ORDER BY tns ASC, event_id ASC) AS nxt
      |  FROM e)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  CAST(SUM((nxt - tns) // 1000) // 1000 AS BIGINT) AS total_ms,
      |  CAST(SUM((nxt - tns) // 1000) // (1000 * COUNT(*)) AS BIGINT)
      |    AS mean_ms
      |FROM nx WHERE nxt IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q196: local clustering coefficient ([[Graph.localClustering]])
    * over the q107 part co-purchase graph — per-part neighborhood
    * density in exact ppm, top 50 by (cc, id). The oracle counts each
    * node's closed neighbor pairs by brute force (adjacency self-join
    * + closing-edge probe), against the operator's oriented-wedge
    * enumeration — two different algorithms, same integers.
    */
  def clusteringParts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val small = li.groupBy(col("ok")).agg(count(lit(1)).as("n"))
      .where(col("n") <= 6).select(col("ok"))
    val li2 = li.join(small, Seq("ok"), "leftsemi")
    val pairs = li2.as("x").join(li2.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    Graph.localClustering(pairs)
      .orderBy(col("cc_ppm").desc_nulls_last, col("id").asc)
      .limit(50)
  }

  val clusteringPartsSql: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |ok6 AS (SELECT ok FROM li GROUP BY ok HAVING COUNT(*) <= 6),
      |li2 AS (SELECT li.* FROM li JOIN ok6 USING (ok)),
      |e AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b FROM li2 x
      |  JOIN li2 y ON x.ok = y.ok AND x.pk < y.pk),
      |adj AS MATERIALIZED (SELECT a AS id, b AS nb FROM e
      |  UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
      |  FROM adj GROUP BY id),
      |tri AS (SELECT n1.id, CAST(COUNT(*) AS BIGINT) AS n_tri
      |  FROM adj n1 JOIN adj n2 ON n2.id = n1.id AND n1.nb < n2.nb
      |  JOIN e ON e.a = n1.nb AND e.b = n2.nb
      |  GROUP BY n1.id)
      |SELECT d.id, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
      |  d.deg * (d.deg - 1) // 2 AS n_wedges,
      |  CASE WHEN d.deg > 1 THEN
      |    COALESCE(t.n_tri, 0) * 1000000 // (d.deg * (d.deg - 1) // 2)
      |  END AS cc_ppm
      |FROM deg d LEFT JOIN tri t ON t.id = d.id
      |ORDER BY cc_ppm DESC NULLS LAST, d.id ASC LIMIT 50""".stripMargin
}
