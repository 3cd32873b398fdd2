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
private[graft] trait QueriesWalksRetrieval { this: Queries.type =>
  /** q157: deterministic random walks ([[Graph.deterministicWalks]])
    * — a DeepWalk-style walk corpus over the co-order parts graph,
    * every step draw content-addressed (md5) so the oracle replays
    * the walks node-for-node through 4 unrolled join rounds.
    */
  def walksParts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val small = li.groupBy(col("ok")).agg(count(lit(1)).as("n"))
      .where(col("n") <= 6).select(col("ok"))
    val li2 = li.join(small, Seq("ok"), "leftsemi")
    val und = li2.as("x").join(li2.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    Graph.deterministicWalks(edges, walksPerNode = 1, steps = 4)
      .orderBy("start", "w", "step")
  }

  val walksPartsSql: String = {
    def h(i: Int) = duckHash60("walk",
      s"concat(CAST(p.start AS VARCHAR), '#', CAST(p.w AS VARCHAR), " +
        s"'#', '$i')")
    val rounds = (1 to 4).map { i =>
      s"""w$i AS MATERIALIZED (
         |  SELECT p.start, p.w, i.dst AS node, $i AS step
         |  FROM w${i - 1} p
         |  JOIN deg d ON d.src = p.node
         |  JOIN idx i ON i.src = p.node AND i.nidx = ${h(i)} % d.deg)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |ok6 AS (SELECT ok FROM li GROUP BY ok HAVING COUNT(*) <= 6),
       |li2 AS MATERIALIZED (SELECT li.* FROM li JOIN ok6 USING (ok)),
       |u AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b FROM li2 x
       |  JOIN li2 y ON x.ok = y.ok AND x.pk < y.pk),
       |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM u
       |  UNION ALL SELECT b, a FROM u),
       |deg AS MATERIALIZED (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
       |idx AS MATERIALIZED (
       |  SELECT src, dst,
       |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
       |      AS BIGINT) AS nidx
       |  FROM e),
       |w0 AS (SELECT DISTINCT src AS start, 0 AS w, src AS node, 0 AS step
       |       FROM e),
       |$rounds
       |SELECT start, CAST(w AS BIGINT) AS w, CAST(step AS BIGINT) AS step,
       |  node
       |FROM (SELECT * FROM w0 UNION ALL SELECT * FROM w1
       |      UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3
       |      UNION ALL SELECT * FROM w4)
       |ORDER BY start, w, step""".stripMargin
  }

  /** q158: retrieval evaluation harness ([[Retrieval.evalMetrics]]) —
    * recall@10, MRR and nDCG@10 of the q113 BM25 ranking against
    * deterministic graded labels (rel = how many of the query's terms
    * the document contains). The oracle replays the BM25 chain, the
    * label derivation, and every metric's integer/floor-e6 arithmetic.
    */
  def retrievalEval(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val docs = t(s, dir, "documents")
    val rank = TextAnalysis.bm25TopK(docs, "doc_id", "text", bm25Queries, 20)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    val qt = bm25Queries.flatMap { case (qid, text) =>
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
        .map(term => (qid, term))
    }.toDF("query_id", "term")
    val dt = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .distinct()
    val rel = dt.join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("rel"))
    Retrieval.evalMetrics(rank, rel, k = 10).orderBy("query_id")
  }

  val retrievalEvalSql: String = {
    val qtRows = bm25Queries.flatMap { case (qid, text) =>
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
        .map(term => s"($qid, '$term')")
    }.mkString(", ")
    val dcgTerm = (rankCol: String) =>
      s"CAST(FLOOR(CAST(rel AS DOUBLE) / (ln(CAST($rankCol AS DOUBLE) " +
        s"+ 1.0) / ln(2.0)) * 1000000.0) AS BIGINT)"
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($duckToks) AS term
       |  FROM documents WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
       |qt(query_id, term) AS (VALUES $qtRows),
       |tfq AS (SELECT * FROM tf WHERE term IN (SELECT DISTINCT term FROM qt)),
       |df AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY 1),
       |scored AS (
       |  SELECT qt.query_id, tfq.doc_id,
       |    CAST(FLOOR(
       |      ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5)) *
       |      ((tfq.tf * (1.2 + 1.0)) /
       |       (tfq.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (CAST(s.sumdl AS DOUBLE) / s.n))))) *
       |      1000000.0) AS BIGINT) AS e6
       |  FROM tfq JOIN qt USING (term) JOIN df USING (term)
       |    JOIN dl USING (doc_id) CROSS JOIN stats s),
       |bmagg AS (SELECT query_id, doc_id, CAST(SUM(e6) AS BIGINT) AS score_e6
       |  FROM scored GROUP BY 1, 2),
       |bm AS (SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_e6 DESC, doc_id ASC) AS rnk
       |  FROM bmagg),
       |relv AS (
       |  SELECT qt.query_id, d.doc_id, CAST(COUNT(*) AS BIGINT) AS rel
       |  FROM (SELECT DISTINCT doc_id, term FROM tok) d
       |  JOIN qt USING (term) GROUP BY 1, 2),
       |topk AS (SELECT * FROM bm WHERE rnk <= 10),
       |j AS (SELECT t.query_id, t.doc_id, t.rnk, r.rel
       |  FROM topk t LEFT JOIN relv r
       |  ON r.query_id = t.query_id AND r.doc_id = t.doc_id),
       |pq AS (
       |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_retrieved,
       |    CAST(COUNT(rel) AS BIGINT) AS hits,
       |    MIN(CASE WHEN rel IS NOT NULL THEN rnk END) AS frst,
       |    CAST(SUM(CASE WHEN rel IS NOT NULL THEN ${dcgTerm("rnk")}
       |      ELSE 0 END) AS BIGINT) AS dcg_e6
       |  FROM j GROUP BY 1),
       |nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant
       |  FROM relv GROUP BY 1),
       |ideal AS (SELECT query_id, rel,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY rel DESC, doc_id ASC) AS irnk
       |  FROM relv),
       |idcg AS (
       |  SELECT query_id, CAST(SUM(${dcgTerm("irnk")}) AS BIGINT) AS idcg_e6
       |  FROM ideal WHERE irnk <= 10 GROUP BY 1)
       |SELECT COALESCE(n.query_id, p.query_id) AS query_id,
       |  COALESCE(n.n_relevant, 0) AS n_relevant,
       |  COALESCE(p.n_retrieved, 0) AS n_retrieved,
       |  COALESCE(p.hits, 0) AS hits,
       |  CASE WHEN n.n_relevant > 0 THEN
       |    COALESCE(p.hits, 0) * 1000000 // n.n_relevant END AS recall_ppm,
       |  CASE WHEN p.frst IS NOT NULL THEN 1000000 // p.frst END AS mrr_e6,
       |  COALESCE(p.dcg_e6, 0) AS dcg_e6,
       |  COALESCE(i.idcg_e6, 0) AS idcg_e6,
       |  CASE WHEN i.idcg_e6 > 0 THEN
       |    COALESCE(p.dcg_e6, 0) * 1000000 // i.idcg_e6 END AS ndcg_ppm
       |FROM nrel n
       |FULL OUTER JOIN pq p ON p.query_id = n.query_id
       |LEFT JOIN idcg i ON i.query_id = COALESCE(n.query_id, p.query_id)
       |ORDER BY query_id""".stripMargin
  }

  /** q159: quantile normalization ([[Stats.quantileNormalize]]) across
    * the first four embedding dimensions — every dimension ends up
    * with the identical marginal; the oracle replays the melt, the
    * (value, id) positional ranks, and the floor rank-means.
    */
  def quantileNormalizeVecs(s: SparkSession, dir: String): DataFrame =
    Stats.quantileNormalize(
        t(s, dir, "embeddings").select(col("vec_id"),
          element_at(col("embedding"), 1).as("d1"),
          element_at(col("embedding"), 2).as("d2"),
          element_at(col("embedding"), 3).as("d3"),
          element_at(col("embedding"), 4).as("d4")),
        "vec_id", Seq("d1", "d2", "d3", "d4"))
      .orderBy("feature", "rnk")

  val quantileNormalizeVecsSql: String =
    """WITH base AS (
      |  SELECT vec_id,
      |    CAST(CAST(embedding[1] AS DECIMAL(14,4)) * 10000 AS BIGINT) AS d1,
      |    CAST(CAST(embedding[2] AS DECIMAL(14,4)) * 10000 AS BIGINT) AS d2,
      |    CAST(CAST(embedding[3] AS DECIMAL(14,4)) * 10000 AS BIGINT) AS d3,
      |    CAST(CAST(embedding[4] AS DECIMAL(14,4)) * 10000 AS BIGINT) AS d4
      |  FROM embeddings
      |  WHERE embedding[1] IS NOT NULL AND embedding[2] IS NOT NULL
      |    AND embedding[3] IS NOT NULL AND embedding[4] IS NOT NULL),
      |m AS (
      |  SELECT vec_id, 'd1' AS feature, d1 AS x_e4 FROM base
      |  UNION ALL SELECT vec_id, 'd2', d2 FROM base
      |  UNION ALL SELECT vec_id, 'd3', d3 FROM base
      |  UNION ALL SELECT vec_id, 'd4', d4 FROM base),
      |r AS (
      |  SELECT vec_id, feature, x_e4,
      |    CAST(row_number() OVER (PARTITION BY feature
      |      ORDER BY x_e4, vec_id) AS BIGINT) AS rnk
      |  FROM m),
      |rm AS (
      |  SELECT rnk,
      |    CAST(FLOOR(CAST(SUM(x_e4) AS DOUBLE) / 4) AS BIGINT) AS norm_e4
      |  FROM r GROUP BY 1)
      |SELECT r.vec_id, r.feature, r.x_e4, r.rnk, rm.norm_e4
      |FROM r JOIN rm USING (rnk)
      |ORDER BY feature, rnk""".stripMargin

  /** q160: period-over-period growth report — daily revenue with
    * previous-day and previous-week deltas as floor-ppm growth (signed
    * values ⇒ double-floor division, identical in both engines); the
    * lag windows ride the day-grain aggregate.
    */
  def revenueGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
    // day-grain global window (calendar-bounded aggregate input)
    val w = Window.orderBy(col("day").asc)
    def growth(prev: Column) = when(prev.isNotNull && prev > 0,
      floor((col("rev_cents") - prev).cast("double") / prev.cast("double") *
        lit(1000000.0)).cast("long"))
    daily
      .withColumn("__p1", lag(col("rev_cents"), 1).over(w))
      .withColumn("__p7", lag(col("rev_cents"), 7).over(w))
      .select(col("day"), col("rev_cents"),
        col("__p1").as("prev_day_cents"),
        growth(col("__p1")).as("dod_ppm"),
        growth(col("__p7")).as("wow_ppm"))
      .orderBy("day")
  }

  val revenueGrowthSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders GROUP BY 1),
      |l AS (
      |  SELECT day, rev_cents,
      |    LAG(rev_cents, 1) OVER (ORDER BY day) AS p1,
      |    LAG(rev_cents, 7) OVER (ORDER BY day) AS p7
      |  FROM daily)
      |SELECT day, rev_cents, p1 AS prev_day_cents,
      |  CASE WHEN p1 IS NOT NULL AND p1 > 0 THEN
      |    CAST(FLOOR(CAST(rev_cents - p1 AS DOUBLE) / CAST(p1 AS DOUBLE)
      |      * 1000000.0) AS BIGINT) END AS dod_ppm,
      |  CASE WHEN p7 IS NOT NULL AND p7 > 0 THEN
      |    CAST(FLOOR(CAST(rev_cents - p7 AS DOUBLE) / CAST(p7 AS DOUBLE)
      |      * 1000000.0) AS BIGINT) END AS wow_ppm
      |FROM l ORDER BY day""".stripMargin

  /** q161: binned mutual information between two CONTINUOUS columns —
    * [[Profile.association]]'s MI/χ²/V machinery applied to fixed-width
    * integer bins of quantity × price: the feature-selection screen
    * for numeric pairs, fully replayed including the binning.
    */
  def binnedMiLineitem(s: SparkSession, dir: String): DataFrame =
    Profile.association(
        t(s, dir, "lineitem").select(
          expr("cast(l_quantity as bigint) div 10").cast("string").as("qbin"),
          expr("cast(floor(l_extendedprice / 10000) as bigint)")
            .cast("string").as("pbin")),
        "qbin", "pbin")

  val binnedMiLineitemSql: String =
    // the q127 contingency replay, over the fixed-width bins
    """WITH cells AS (
      |  SELECT CAST(CAST(l_quantity AS BIGINT) // 10 AS VARCHAR) AS a,
      |    CAST(CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS VARCHAR)
      |      AS b,
      |    CAST(COUNT(*) AS BIGINT) AS nab
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |  GROUP BY 1, 2),
      |ma AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY 1),
      |mb AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(nab) AS BIGINT) AS n FROM cells),
      |grid AS (
      |  SELECT ma.na, mb.nb, t.n, COALESCE(c.nab, 0) AS nab
      |  FROM ma CROSS JOIN mb
      |    LEFT JOIN cells c ON c.a = ma.a AND c.b = mb.b
      |    CROSS JOIN tot t),
      |terms AS (
      |  SELECT n,
      |    CASE WHEN nab > 0 THEN CAST(FLOOR(
      |      (CAST(nab AS DOUBLE) / n) *
      |      ln(CAST(nab AS DOUBLE) * n / (CAST(na AS DOUBLE) * nb)) *
      |      1000000.0) AS BIGINT) ELSE 0 END AS mi_t,
      |    CAST(FLOOR((nab - CAST(na AS DOUBLE) * nb / n) *
      |      (nab - CAST(na AS DOUBLE) * nb / n) /
      |      (CAST(na AS DOUBLE) * nb / n) * 1000000.0) AS BIGINT) AS chi_t
      |  FROM grid),
      |cards AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ma) AS card_a,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM mb) AS card_b)
      |SELECT COALESCE(MAX(t2.n), 0) AS n, cards.card_a, cards.card_b,
      |  COALESCE(CAST(SUM(t2.mi_t) AS BIGINT), 0) AS mi_e6,
      |  COALESCE(CAST(SUM(t2.chi_t) AS BIGINT), 0) AS chi2_e6,
      |  GREATEST(cards.card_a - 1, 0) * GREATEST(cards.card_b - 1, 0) AS dof,
      |  CASE WHEN GREATEST(cards.card_a - 1, 0) *
      |      GREATEST(cards.card_b - 1, 0) > 0 AND MAX(t2.n) > 0 THEN
      |    CAST(FLOOR(sqrt((CAST(SUM(t2.chi_t) AS DOUBLE) / 1000000.0) /
      |      (MAX(t2.n) * LEAST(cards.card_a - 1, cards.card_b - 1)))
      |      * 1000000.0) AS BIGINT) END AS cramers_v_e6
      |FROM terms t2 CROSS JOIN cards
      |GROUP BY cards.card_a, cards.card_b""".stripMargin

  /** q162: cohort LTV curves — users cohorted by first-activity day;
    * per (cohort, age-in-days): purchase value accumulated to that age
    * as floor-cents, cumulative via a cohort-partitioned window over
    * the AGGREGATE (cohort × age grain). The lifetime-value readout
    * every growth team tracks, all-integer.
    */
  def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        expr("ts div 86400000000000L").as("day"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
    val rev = ev.where(col("event_type") === "purchase")
      .join(cohort, Seq("user_id"))
      .groupBy(col("c0").as("cohort"), (col("day") - col("c0")).as("age"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("rev_cents"),
        count(lit(1)).as("n_purchases"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val sizes = cohort.groupBy(col("c0").as("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    rev
      .withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .join(sizes, Seq("cohort"))
      .withColumn("ltv_cents_per_user",
        expr("cum_cents div cohort_users"))
      .orderBy("cohort", "age")
  }

  val cohortLtvSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, value,
      |    epoch_ns(ts) // 86400000000000 AS day FROM events),
      |cohort AS (SELECT user_id, MIN(day) AS c0 FROM ev GROUP BY 1),
      |sizes AS (SELECT c0 AS cohort, CAST(COUNT(*) AS BIGINT)
      |    AS cohort_users FROM cohort GROUP BY 1),
      |rev AS (
      |  SELECT c.c0 AS cohort, e.day - c.c0 AS age,
      |    CAST(SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents,
      |    CAST(COUNT(*) AS BIGINT) AS n_purchases
      |  FROM ev e JOIN cohort c USING (user_id)
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT cohort, age, rev_cents, n_purchases,
      |    CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY age
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_cents
      |  FROM rev)
      |SELECT c.cohort, c.age, c.rev_cents, c.n_purchases, c.cum_cents,
      |  s.cohort_users, c.cum_cents // s.cohort_users AS ltv_cents_per_user
      |FROM c JOIN sizes s ON s.cohort = c.cohort
      |ORDER BY c.cohort, c.age""".stripMargin

  /** q163: SEASONAL rolling outliers — the q128 monitor with a
    * day-of-week-aware baseline: each (priority, weekday) series is
    * its own trailing window, so a Saturday is judged against
    * Saturdays ([[Stats.rollingOutliers]] composes; no new operator —
    * the seasonality lives in the key).
    */
  def seasonalOutliers(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("t"),
        dayofweek(to_date(col("o_orderdate"))).cast("long").as("dow"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("x"))
      .withColumn("k", concat(col("prio"), lit("#"), col("dow")))
    Stats.rollingOutliers(daily.select(col("k"), col("t"), col("x")),
        "k", "t", "x", window = 8, kTenths = 25)
      .orderBy("k", "t")
  }

  val seasonalOutliersSql: String =
    """WITH d AS (
      |  SELECT o_orderpriority || '#' ||
      |      CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS VARCHAR) AS k,
      |    CAST(o_orderdate AS DATE) AS t,
      |    CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2),
      |f AS (
      |  SELECT k, t, x,
      |    COUNT(x) OVER w AS n, SUM(x) OVER w AS s, SUM(x * x) OVER w AS ss
      |  FROM d WINDOW w AS (PARTITION BY k ORDER BY t
      |    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
      |SELECT k, t, x, CAST(n AS BIGINT) AS baseline_rows,
      |  CASE WHEN n >= 8 AND x IS NOT NULL THEN
      |    (n * x - s) * (n * x - s) * 100 > 625 * (n * ss - s * s)
      |  END AS is_outlier
      |FROM f ORDER BY k, t""".stripMargin

  /** q164: DEADLINE funnel — view → click → purchase completed within
    * 2 days of the user's FIRST view: the conversion-window variant
    * every product funnel ships with, expressed as an anchored filter
    * + the q104 funnel (the deadline lives in the data, not a new
    * operator). The oracle replays the anchor, the cutoff, and the
    * min-chaining.
    */
  def deadlineFunnel(s: SparkSession, dir: String): DataFrame = {
    val twoDays = 2L * 86400000000000L
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
    val anchor = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("__t0"))
    val bounded = ev.join(anchor, Seq("user_id"))
      .where(col("ts") <= col("__t0") + twoDays)
      .drop("__t0")
    Behavior.funnel(bounded, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
      .orderBy("step")
  }

  val deadlineFunnelSql: String =
    """WITH e0 AS (SELECT user_id, epoch_ns(ts) AS ts, event_type
      |            FROM events),
      |anchor AS (SELECT user_id, MIN(ts) AS t0 FROM e0
      |           WHERE event_type = 'view' GROUP BY 1),
      |e AS (SELECT e0.* FROM e0 JOIN anchor a USING (user_id)
      |      WHERE e0.ts <= a.t0 + 172800000000000),
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

  /** q165: the classic TPC-H Q3 "shipping priority" shape — segment
    * filter → customer⋈orders⋈lineitem → per-order revenue → top 10.
    * The optimizer showcase: the segment filter is pushed to the
    * customer scan, the filtered dimension is broadcast, and dates
    * prune orders/lineitem at the scan. Revenue is summed as DECIMAL
    * (extendedprice and discount are 2-decimal-clean, so the per-row
    * product is EXACT at scale 4 and the sum is reduction-order
    * independent — a double sum would be partitioning-dependent);
    * ordering happens on the exact decimal, output casts to double.
    */
  def tpchShipping(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-06-01").cast("timestamp")
    val cust = t(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = t(s, dir, "orders")
      .where(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = t(s, dir, "lineitem")
      .where(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("__rev"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("__rev")).as("__revd"))
      .orderBy(col("__revd").desc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"),
        col("__revd").cast("double").as("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"))
  }

  val tpchShippingSql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             (1 - CAST(l_discount AS DECIMAL(18,2)))) DESC,
      |         l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** q166: RFM customer segmentation — recency (days since last order,
    * against the corpus max-date anchor so the query is reproducible),
    * frequency (order count), monetary (floor-cents lifetime value),
    * each quintiled by [[Stats.equiDepthBins]]. Value-boundary bins
    * (not ntile) so tied metrics always land in the same bucket AND
    * there is no global single-partition window sort — the boundaries
    * are five `percentile_disc` aggregates broadcast back, the q92
    * pattern, which survives a billion-customer table. Scores are
    * directed the marketing way: 5 = best (most recent / most orders /
    * highest spend).
    */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,2)").as("__p"))
    val anchor = ord.agg(max(col("o_orderdate")).as("__amax"))
    val base = ord.crossJoin(anchor)
      .groupBy(col("o_custkey"))
      .agg(
        min(datediff(col("__amax"), col("o_orderdate"))).as("r_days"),
        count(lit(1)).as("f_orders"),
        sum(col("__p") * 100).cast("long").as("m_cents"))
      .withColumn("__g", lit(1))
    val r = Stats.equiDepthBins(base, Seq("__g"), "r_days", nBins = 5)
      .withColumnRenamed("bin", "__rb")
    val rf = Stats.equiDepthBins(r, Seq("__g"), "f_orders", nBins = 5)
      .withColumnRenamed("bin", "__fb")
    val rfm = Stats.equiDepthBins(rf, Seq("__g"), "m_cents", nBins = 5)
      .withColumnRenamed("bin", "__mb")
    rfm.select(col("o_custkey").as("c_custkey"),
        col("r_days").cast("long").as("r_days"), col("f_orders"),
        col("m_cents"),
        (lit(5) - col("__rb")).cast("long").as("r_score"),
        (col("__fb") + 1).cast("long").as("f_score"),
        (col("__mb") + 1).cast("long").as("m_score"),
        ((lit(5) - col("__rb")) * 100 + (col("__fb") + 1) * 10 +
          (col("__mb") + 1)).cast("long").as("rfm"))
      .orderBy("c_custkey")
  }

  val rfmSegmentsSql: String = {
    // one boundary CTE per metric, each replaying equiDepthBins'
    // SQL-standard definition (min value with cume_dist >= b/5),
    // then bin = count of boundaries strictly below the value
    def bnd(metric: String) =
      s"""(SELECT b, MIN($metric) AS vb FROM (
         |   SELECT $metric,
         |     CUME_DIST() OVER (ORDER BY $metric) AS c FROM base)
         | CROSS JOIN (VALUES (1), (2), (3), (4)) bs(b)
         | WHERE c >= CAST(b AS DOUBLE) / 5 GROUP BY b)""".stripMargin
    def bin(metric: String, tbl: String) =
      s"(SELECT COUNT(*) FROM $tbl WHERE base.$metric > vb)"
    s"""WITH base AS (
       |  SELECT o_custkey,
       |    MIN(date_diff('day', o_orderdate,
       |        (SELECT MAX(o_orderdate) FROM orders))) AS r_days,
       |    COUNT(*) AS f_orders,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
       |      AS m_cents
       |  FROM orders GROUP BY o_custkey),
       |rb AS ${bnd("r_days")},
       |fb AS ${bnd("f_orders")},
       |mb AS ${bnd("m_cents")}
       |SELECT o_custkey AS c_custkey, CAST(r_days AS BIGINT) AS r_days,
       |  f_orders, m_cents,
       |  5 - ${bin("r_days", "rb")} AS r_score,
       |  ${bin("f_orders", "fb")} + 1 AS f_score,
       |  ${bin("m_cents", "mb")} + 1 AS m_score,
       |  (5 - ${bin("r_days", "rb")}) * 100 +
       |  (${bin("f_orders", "fb")} + 1) * 10 +
       |  ${bin("m_cents", "mb")} + 1 AS rfm
       |FROM base ORDER BY c_custkey""".stripMargin
  }

  /** q167: bigram LM perplexity quality screen
    * ([[TextAnalysis.bigramLmScore]]) — per-language add-one-smoothed
    * bigram models trained on the even-doc_id half, scoring the
    * held-out odd half by mean surprisal per bigram (the CCNet-style
    * fluency filter). The oracle replays tokenization, the bigram zip,
    * both model counts, the vocabulary, and every floored e6 ln term.
    */
  def lmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    TextAnalysis.bigramLmScore(
        d.where(col("doc_id") % 2 === 0),
        d.where(col("doc_id") % 2 === 1),
        "doc_id", "text", "lang")
      .orderBy("doc_id")
  }

  val lmPerplexitySql: String =
    s"""WITH tokd AS (SELECT doc_id, lang, $duckToks AS toks
       |              FROM documents WHERE text IS NOT NULL),
       |b2 AS (SELECT doc_id, lang, bg.w1 AS w1, bg.w2 AS w2 FROM
       |  (SELECT doc_id, lang,
       |     unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
       |             for i in range(1, len(toks))]) AS bg
       |   FROM tokd WHERE len(toks) >= 2)),
       |c12 AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM b2
       |        WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
       |ctx AS (SELECT lang, w1, SUM(c12) AS ctx FROM c12 GROUP BY 1, 2),
       |v AS (SELECT lang, COUNT(DISTINCT t) AS v FROM
       |        (SELECT lang, unnest(toks) AS t FROM tokd
       |         WHERE doc_id % 2 = 0) GROUP BY 1),
       |tf AS (SELECT doc_id, lang, w1, w2, COUNT(*) AS tf FROM b2
       |       WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3, 4),
       |sc AS (SELECT tf.doc_id, tf.lang, tf.tf,
       |  CAST(floor(ln(CAST(COALESCE(ctx.ctx, 0) + v.v AS DOUBLE) /
       |                CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE))
       |       * 1000000) AS BIGINT) AS term
       |  FROM tf JOIN v USING (lang)
       |  LEFT JOIN ctx ON tf.lang = ctx.lang AND tf.w1 = ctx.w1
       |  LEFT JOIN c12 ON tf.lang = c12.lang AND tf.w1 = c12.w1
       |    AND tf.w2 = c12.w2)
       |SELECT doc_id, lang, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(tf * term) // SUM(tf) AS BIGINT) AS nll_e6
       |FROM sc GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** q168: EXACT set-similarity self-join
    * ([[SetSimJoin.tokenJaccardSelfPairs]]) — every English-document
    * pair with WORD-set Jaccard ≥ 0.95, found by prefix filtering
    * (provably complete, unlike the MinHash family's probabilistic
    * recall). Scoped to one language on purpose: the synthetic corpus
    * shares one dense vocabulary, the known worst case for word-unit
    * prefix filtering (the operator's scaladoc quantifies it); the
    * corpus-wide exact join runs on the sparser shingle unit instead
    * (q178). The oracle is the literal all-pairs Jaccard join — the
    * prefix filter must lose nothing and the verify must add nothing.
    */
  def setsimJoin(s: SparkSession, dir: String): DataFrame =
    SetSimJoin.tokenJaccardSelfPairs(
        t(s, dir, "documents").where(col("lang") === "en"),
        "doc_id", "text", thresholdPpm = 950000L)
      .orderBy("id_a", "id_b")

  val setsimJoinSql: String =
    s"""WITH tok AS (SELECT doc_id, list_distinct($duckToks) AS s
       |             FROM documents WHERE lang = 'en'),
       |tk AS (SELECT doc_id, s FROM tok WHERE len(s) >= 1),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
       |        CAST(len(a.s) + len(b.s)
       |             - len(list_intersect(a.s, b.s)) AS BIGINT) AS uni
       |      FROM tk a JOIN tk b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, inter, uni, (inter * 1000000) // uni AS jac_ppm
       |FROM p WHERE inter * 1000000 >= uni * 950000
       |ORDER BY id_a, id_b""".stripMargin

  /** q169: prefix autocomplete index ([[TextAnalysis.prefixSuggest]])
    * — top-3 corpus terms per 1..4-char prefix by term frequency.
    * Oracle replays the tf count, the prefix fan-out, and the rank
    * window.
    */
  def prefixSuggest(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.prefixSuggest(t(s, dir, "documents"), "doc_id", "text",
        maxPrefixLen = 4, k = 3)
      .orderBy("prefix", "rnk")

  val prefixSuggestSql: String =
    s"""WITH tf AS (SELECT t AS term, COUNT(*) AS tf FROM
       |  (SELECT unnest($duckToks) AS t FROM documents
       |   WHERE text IS NOT NULL) GROUP BY 1),
       |pre AS (SELECT substr(term, 1, p) AS prefix, term, tf
       |        FROM tf CROSS JOIN (SELECT unnest(range(1, 5)) AS p)
       |        WHERE len(term) >= p),
       |r AS (SELECT prefix, term, tf, row_number() OVER (
       |        PARTITION BY prefix ORDER BY tf DESC, term ASC) AS rnk
       |      FROM pre)
       |SELECT prefix, CAST(rnk AS BIGINT) AS rnk, term, tf
       |FROM r WHERE rnk <= 3 ORDER BY prefix, rnk""".stripMargin

  /** q170: incremental aggregate maintenance
    * ([[ChangeCapture.incrementalAggDelta]] + [[ChangeCapture
    * .applyAggDelta]]) — a maintained per-status (rows, cents) rollup
    * of orders updated from a CDC batch ALONE (group moves, a stale
    * loser, deletes, inserts, and a same-ts U/D tie settled by the tie
    * column). The oracle recomputes the rollup from the fully merged
    * snapshot — delta maintenance must equal rescan.
    */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
      (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("v"))
    val upd = base.where(col("k") % 7 === 0)
      .select(col("k"), lit(100L).as("ts"), lit(1L).as("tie"),
        lit("U").as("op"), lit("X").as("grp"), (col("v") + 500L).as("v"))
    val stale = base.where(col("k") % 21 === 0)
      .select(col("k"), lit(50L).as("ts"), lit(9L).as("tie"),
        lit("U").as("op"), lit("stale").as("grp"), lit(1L).as("v"))
    val del = base.where(col("k") % 11 === 3)
      .select(col("k"), lit(100L).as("ts"), lit(2L).as("tie"),
        lit("D").as("op"), lit(null).cast("string").as("grp"),
        lit(null).cast("long").as("v"))
    val ins = base.where(col("k") % 97 === 5)
      .select((col("k") + 1000000L).as("k"), lit(100L).as("ts"),
        lit(1L).as("tie"), lit("U").as("op"), lit("NEW").as("grp"),
        lit(12345L).as("v"))
    val updTie = base.where(col("k") % 91 === 0)
      .select(col("k"), lit(100L).as("ts"), lit(3L).as("tie"),
        lit("U").as("op"), lit("UPD").as("grp"), lit(777L).as("v"))
    val delTie = base.where(col("k") % 91 === 0)
      .select(col("k"), lit(100L).as("ts"), lit(5L).as("tie"),
        lit("D").as("op"), lit(null).cast("string").as("grp"),
        lit(null).cast("long").as("v"))
    val changes = upd.unionByName(stale).unionByName(del)
      .unionByName(ins).unionByName(updTie).unionByName(delTie)
    val baseAgg = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_val"))
    val delta = ChangeCapture.incrementalAggDelta(base, changes,
      "k", "ts", "tie", "op", "grp", "v")
    ChangeCapture.applyAggDelta(baseAgg, delta, "grp")
      .orderBy("grp")
  }

  val incrementalAggSql: String =
    """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS grp,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |changes AS (
      |  SELECT k, 100 AS ts, 1 AS tie, 'U' AS op, 'X' AS grp,
      |    v + 500 AS v FROM base WHERE k % 7 = 0
      |  UNION ALL SELECT k, 50, 9, 'U', 'stale', 1
      |    FROM base WHERE k % 21 = 0
      |  UNION ALL SELECT k, 100, 2, 'D', NULL, NULL
      |    FROM base WHERE k % 11 = 3
      |  UNION ALL SELECT k + 1000000, 100, 1, 'U', 'NEW', 12345
      |    FROM base WHERE k % 97 = 5
      |  UNION ALL SELECT k, 100, 3, 'U', 'UPD', 777
      |    FROM base WHERE k % 91 = 0
      |  UNION ALL SELECT k, 100, 5, 'D', NULL, NULL
      |    FROM base WHERE k % 91 = 0),
      |verdict AS (SELECT k, op, grp, v FROM (
      |    SELECT *, row_number() OVER (PARTITION BY k
      |      ORDER BY ts DESC, tie DESC) AS rn FROM changes)
      |  WHERE rn = 1),
      |merged AS (
      |  SELECT CASE WHEN v.op = 'U' THEN v.grp ELSE b.grp END AS grp,
      |    CASE WHEN v.op = 'U' THEN v.v ELSE b.v END AS v
      |  FROM base b FULL OUTER JOIN verdict v ON b.k = v.k
      |  WHERE v.op IS NULL OR v.op = 'U')
      |SELECT grp, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_val
      |FROM merged GROUP BY grp ORDER BY grp""".stripMargin

  /** q171: deterministic pseudonymization ([[Quality.pseudonymize]])
    * — customer keys replaced by salted-hash surrogates in BOTH
    * customer and orders, then joined ON THE PSEUDONYM: per-nation
    * order counts/revenue hash-match the plaintext join (referential
    * integrity survives the scrub) and min_pseudonym pins the
    * surrogate values themselves to the md5 replay.
    */
  def pseudonymizeJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Quality.pseudonymize(
      t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
      Seq("c_custkey"), salt = "q171")
    val ords = Quality.pseudonymize(
      t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice")),
      Seq("o_custkey"), salt = "q171")
    ords.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(countDistinct(col("c_custkey")).as("n_pseudonyms"),
        count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("rev_cents"),
        min(col("c_custkey")).as("min_pseudonym"))
      .orderBy("c_nationkey")
  }

  val pseudonymizeJoinSql: String = {
    val pc = duckHash60("q171", "c_custkey")
    val po = duckHash60("q171", "o_custkey")
    s"""WITH cust AS (SELECT $pc AS p, c_nationkey FROM customer
       |              WHERE c_custkey IS NOT NULL),
       |ords AS (SELECT $po AS p, o_totalprice FROM orders
       |         WHERE o_custkey IS NOT NULL)
       |SELECT c_nationkey, COUNT(DISTINCT p) AS n_pseudonyms,
       |  COUNT(*) AS n_orders,
       |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
       |       AS BIGINT)) AS BIGINT) AS rev_cents,
       |  MIN(p) AS min_pseudonym
       |FROM ords JOIN cust USING (p)
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  }

  /** q172: grid-blocked DBSCAN ([[SpatialJoin.dbscan]]) over the q149
    * md5-derived point plane — core/border/noise kinds + smallest-
    * core-id cluster labels at radius 3000, minPts 5. The oracle
    * replays the all-pairs neighbor graph, the degree threshold, the
    * recursive-CTE components over core-core edges, and the min-label
    * border election.
    */
  def dbscanPoints(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "customer").select(col("c_custkey").as("id"),
      (graft.functions.PortableHash.hash60(col("c_custkey"), "gx")
        % 100000).as("x"),
      (graft.functions.PortableHash.hash60(col("c_custkey"), "gy")
        % 100000).as("y"))
    SpatialJoin.dbscan(pts, "id", "x", "y", radius = 3000L, minPts = 5)
      .orderBy("id")
  }

  val dbscanPointsSql: String = {
    val hx = duckHash60("gx", "c_custkey")
    val hy = duckHash60("gy", "c_custkey")
    s"""WITH RECURSIVE p AS (
       |  SELECT c_custkey AS id, $hx % 100000 AS x, $hy % 100000 AS y
       |  FROM customer WHERE c_custkey IS NOT NULL),
       |pr AS (SELECT a.id AS id_a, b.id AS id_b
       |       FROM p a JOIN p b ON a.id < b.id
       |       WHERE (a.x - b.x) * (a.x - b.x)
       |           + (a.y - b.y) * (a.y - b.y) <= 9000000),
       |adj AS (SELECT id_a AS id, id_b AS nb FROM pr
       |        UNION ALL SELECT id_b, id_a FROM pr),
       |deg AS (SELECT id, COUNT(*) AS n FROM adj GROUP BY 1),
       |flag AS (SELECT p.id, COALESCE(deg.n, 0) + 1 >= 5 AS core
       |         FROM p LEFT JOIN deg USING (id)),
       |ce AS (SELECT id_a, id_b FROM pr
       |       JOIN flag fa ON fa.id = pr.id_a AND fa.core
       |       JOIN flag fb ON fb.id = pr.id_b AND fb.core),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM ce
       |          UNION SELECT id_b, id_a FROM ce),
       |reach(v, u) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT reach.v, e.dst FROM reach JOIN edges e ON e.src = reach.u),
       |labels AS (SELECT v AS id, min(u) AS group_id FROM reach GROUP BY v),
       |corelab AS (SELECT f.id, COALESCE(l.group_id, f.id) AS cl
       |            FROM flag f LEFT JOIN labels l USING (id) WHERE f.core),
       |borderlab AS (SELECT adj.id, MIN(c.cl) AS bl FROM adj
       |              JOIN corelab c ON adj.nb = c.id GROUP BY adj.id)
       |SELECT f.id,
       |  CASE WHEN f.core THEN 'core'
       |       WHEN b.bl IS NOT NULL THEN 'border'
       |       ELSE 'noise' END AS kind,
       |  CASE WHEN f.core THEN c.cl ELSE b.bl END AS cluster
       |FROM flag f LEFT JOIN corelab c USING (id)
       |LEFT JOIN borderlab b USING (id)
       |ORDER BY id""".stripMargin
  }

  /** q173: exact ROC-AUC ([[Stats.rocAuc]]) — does price predict
    * returns, per line status: the Mann-Whitney rank-sum AUC with
    * midrank ties in exact integers. Oracle replays the rank window,
    * the tie counts, and the one floor division.
    */
  def rocAucReturns(s: SparkSession, dir: String): DataFrame =
    Stats.rocAuc(
        t(s, dir, "lineitem").select(col("l_linestatus"),
          col("l_extendedprice").as("score"),
          (col("l_returnflag") === "R").as("label")),
        Seq("l_linestatus"), "score", "label")
      .orderBy("l_linestatus")

  val rocAucReturnsSql: String =
    """WITH r0 AS (SELECT l_linestatus AS g, l_extendedprice AS score,
      |    l_returnflag = 'R' AS lab FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
      |rk AS (SELECT g, lab,
      |    RANK() OVER (PARTITION BY g ORDER BY score ASC) AS r,
      |    COUNT(*) OVER (PARTITION BY g, score) AS c
      |  FROM r0),
      |agg AS (SELECT g,
      |    SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS n_pos,
      |    SUM(CASE WHEN lab THEN 0 ELSE 1 END) AS n_neg,
      |    SUM(CASE WHEN lab THEN 2 * r + c - 1 ELSE 0 END) AS s2
      |  FROM rk GROUP BY 1)
      |SELECT g AS l_linestatus, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_neg AS BIGINT) AS n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    CAST((1000000 * (s2 - n_pos * (n_pos + 1)))
      |         // (2 * n_pos * n_neg) AS BIGINT) END AS auc_e6
      |FROM agg ORDER BY g""".stripMargin

  /** q174: SemDeDup ([[Similarity.semDeDup]]) — cluster-then-prune
    * semantic dedup over embeddings with PLANTED near-dup copies (the
    * q94 one-coordinate-zeroed construction, cos ≈ 0.99 to their
    * source). Centroids are the 8 lowest-id natural vectors (collected
    * O(k), the IVF precedent) so the oracle replays the assignment
    * argmin, the within-cluster pair scan, and the lower-id prune rule
    * exactly.
    */
  def semDedupQuery(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // two-step select: the zeroed index must come from the SOURCE id —
    // in a single select Spark resolves the lambda's col("vec_id")
    // against the ALIASED (+100000) output, silently zeroing the wrong
    // coordinate (caught by the oracle; the oracle's e0.vec_id is
    // unambiguous)
    val planted = e.where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("__src"), col("embedding"))
      .select((col("__src") + 100000L).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => when(i === (col("__src") % 64).cast("int"), lit(0.0))
            .otherwise(x)).as("embedding"))
    val corpus = e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .unionByName(planted)
    val centroids = e.where(col("vec_id") < 8).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    Similarity.semDeDup(corpus, "vec_id", "embedding", centroids,
        threshold = 0.95)
      .orderBy("id")
  }

  val semDedupSql: String =
    """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |            FROM embeddings),
      |pl AS (SELECT e0.vec_id + 100000 AS vec_id,
      |         list_transform(v, (x, i) -> CASE
      |           WHEN i - 1 = CAST(e0.vec_id % 64 AS INT) THEN 0.0
      |           ELSE x END) AS v
      |       FROM e0 WHERE e0.vec_id % 25 = 0),
      |u AS (SELECT * FROM e0 UNION ALL SELECT * FROM pl),
      |c AS (SELECT vec_id AS cid, v FROM e0 WHERE vec_id < 8),
      |d AS (SELECT u.vec_id, c.cid,
      |        list_dot_product(c.v, c.v)
      |          - 2 * list_dot_product(u.v, c.v) AS dist
      |      FROM u CROSS JOIN c),
      |asg AS (SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dist ASC, cid ASC) AS rn FROM d) WHERE rn = 1),
      |r AS (SELECT u.vec_id AS id, asg.cid AS cluster, u.v
      |      FROM u JOIN asg ON u.vec_id = asg.vec_id),
      |pruned AS (SELECT DISTINCT b.id FROM r a JOIN r b
      |  ON a.cluster = b.cluster AND a.id < b.id
      |  WHERE COALESCE(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) *
      |     sqrt(list_dot_product(b.v, b.v))), 0.0) >= 0.95)
      |SELECT r.id, CAST(r.cluster AS BIGINT) AS cluster,
      |  r.id IN (SELECT id FROM pruned) AS pruned
      |FROM r ORDER BY r.id""".stripMargin

  /** q175: dyadic EWMA ([[Stats.dyadicEwma]]) — α = ½ exponential
    * smoothing of daily revenue per order priority in exact integers
    * (lag chain with power-of-two weights; no float decay drift). The
    * oracle replays all 8 lags and the one floor division.
    */
  def ewmaRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("v"))
    Stats.dyadicEwma(daily, Seq("o_orderpriority"), "day", "v", w = 8)
      .select(col("o_orderpriority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("v"),
        col("ewma_milli"))
      .orderBy("o_orderpriority", "day")
  }

  val ewmaRevenueSql: String = {
    val lags = (0 until 8).map(j =>
      s"COALESCE(LAG(v, $j) OVER w, 0) * ${1L << (8 - 1 - j)}")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
       |         AS BIGINT)) AS BIGINT) AS v
       |  FROM orders GROUP BY 1, 2)
       |SELECT o_orderpriority, strftime(day, '%Y-%m-%d') AS day, v,
       |  CAST((1000 * ($lags)) // 256 AS BIGINT) AS ewma_milli
       |FROM daily
       |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day ASC)
       |ORDER BY o_orderpriority, day""".stripMargin
  }

  /** q176: native time-window aggregation — Spark's `window()`
    * grouping (TimeWindow), tumbling 3-day and hopping 4-day/2-day
    * variants in one report. Windows are epoch-aligned UTC; the
    * oracle replays the integer bucket arithmetic on microseconds.
    */
  def timeWindows(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(expr("timestamp_micros(ts DIV 1000)").as("tt"),
        col("event_type"))
    val tumble = ev.groupBy(window(col("tt"), "3 days").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(lit("tumble3d").as("kind"),
        date_format(col("w.start"), "yyyy-MM-dd").as("w_start"),
        date_format(col("w.end"), "yyyy-MM-dd").as("w_end"), col("n"))
    val hop = ev.groupBy(window(col("tt"), "4 days", "2 days").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(lit("hop4d2d").as("kind"),
        date_format(col("w.start"), "yyyy-MM-dd").as("w_start"),
        date_format(col("w.end"), "yyyy-MM-dd").as("w_end"), col("n"))
    tumble.unionByName(hop).orderBy("kind", "w_start")
  }

  val timeWindowsSql: String =
    """WITH e AS (SELECT epoch_ns(ts) // 1000 AS us FROM events),
      |tum AS (
      |  SELECT 'tumble3d' AS kind,
      |    (us // 259200000000) * 259200000000 AS s_us, COUNT(*) AS n
      |  FROM e GROUP BY 2),
      |hop AS (
      |  SELECT 'hop4d2d' AS kind,
      |    ((us - j.j * 172800000000) // 345600000000) * 345600000000
      |      + j.j * 172800000000 AS s_us,
      |    COUNT(*) AS n
      |  FROM e CROSS JOIN (VALUES (0), (1)) j(j)
      |  GROUP BY 2),
      |u AS (SELECT * FROM tum UNION ALL SELECT * FROM hop),
      |f AS (SELECT kind,
      |    strftime(make_timestamp(s_us), '%Y-%m-%d') AS w_start,
      |    strftime(make_timestamp(s_us +
      |      CASE WHEN kind = 'tumble3d' THEN 259200000000
      |           ELSE 345600000000 END), '%Y-%m-%d') AS w_end,
      |    n
      |  FROM u)
      |SELECT kind, w_start, w_end, n FROM f
      |ORDER BY kind, w_start""".stripMargin
}
