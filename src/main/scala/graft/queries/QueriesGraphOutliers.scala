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
private[graft] trait QueriesGraphOutliers { this: Queries.type =>
  /** q118: multi-source BFS hop distance ([[graft.operators.Graph.bfsLevels]],
    * depth ≤ 4) over q97's undirected customer↔part graph from
    * customers {1, 2, 3} — "how far is every entity from the seed
    * set". Exact integer levels; the oracle replays the search as a
    * recursive CTE (UNION-dedup) with min-level aggregation, which is
    * the same first-discovery rule the frontier anti-join enforces.
    */
  def bfsParts(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val fwd = l.join(broadcast(o), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.bfsLevels(edges, Seq(1L, 2L, 3L), maxDepth = 4)
      .orderBy("id")
  }

  val bfsPartsSql: String =
    """WITH RECURSIVE fwd AS (
      |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
      |    CAST(l.l_partkey + 10000000 AS BIGINT) AS dst
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |e AS (SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd),
      |bfs(id, level) AS (
      |  SELECT * FROM (VALUES (CAST(1 AS BIGINT), 0), (2, 0), (3, 0))
      |  UNION
      |  SELECT e.dst, b.level + 1
      |  FROM bfs b JOIN e ON e.src = b.id WHERE b.level < 4)
      |SELECT id, CAST(MIN(level) AS BIGINT) AS level
      |FROM bfs GROUP BY id ORDER BY id""".stripMargin

  /** q119: readability screen ([[TextFunctions.fleschCenti]]) — Flesch
    * reading-ease per document from integer word/sentence/syllable-run
    * counts, in floor-centipoints (null-words docs yield null, never
    * NaN). One narrow scan; the oracle replays the counts with
    * `regexp_extract_all` and the identical double chain.
    */
  def readabilityDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_words"),
        TextFunctions.sentenceCount(col("text")).cast("long").as("n_sentences"),
        TextFunctions.syllableCount(col("text")).cast("long").as("n_syllables"),
        TextFunctions.fleschCenti(col("text")).as("flesch_centi"))
      .orderBy("doc_id")

  val readabilityDocsSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(len($duckToks) AS BIGINT) AS n_words,
       |    CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
       |      AS BIGINT) AS n_sentences,
       |    CAST(len(regexp_extract_all(text, '[AEIOUYaeiouy]+'))
       |      AS BIGINT) AS n_syllables
       |  FROM documents)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  CASE WHEN n_words > 0 THEN CAST(FLOOR(
       |    (206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
       |     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)) * 100)
       |    AS BIGINT) END AS flesch_centi
       |FROM m ORDER BY doc_id""".stripMargin

  /** q120: population stability index ([[Stats.psi]]) — o_totalprice
    * distribution drift across the q117 date split, 10 fixed
    * equi-width bins of 50k, Laplace-smoothed floor-ppm shares, one
    * ln per bin. The per-bin report plus the attached psi_total_e6;
    * the oracle replays bins, smoothing and the identical double
    * chain over generate_series.
    */
  def psiOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cut = lit("1998-01-01").cast("timestamp")
    Stats.psi(
        o.where(col("o_orderdate") < cut).select(col("o_totalprice")),
        o.where(col("o_orderdate") >= cut).select(col("o_totalprice")),
        "o_totalprice", binWidth = 50000L, maxBin = 9)
      .orderBy("bin")
  }

  val psiOrdersSql: String =
    """WITH bins AS (SELECT CAST(unnest(generate_series(0, 9)) AS BIGINT) AS bin),
      |ba AS (SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice) AS BIGINT), 0)
      |    // 50000, 9) AS bin, COUNT(*) AS n
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |    AND o_totalprice IS NOT NULL GROUP BY 1),
      |bb AS (SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice) AS BIGINT), 0)
      |    // 50000, 9) AS bin, COUNT(*) AS n
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |    AND o_totalprice IS NOT NULL GROUP BY 1),
      |c AS (SELECT bins.bin,
      |    CAST(COALESCE(ba.n, 0) AS BIGINT) AS n_a,
      |    CAST(COALESCE(bb.n, 0) AS BIGINT) AS n_b
      |  FROM bins LEFT JOIN ba USING (bin) LEFT JOIN bb USING (bin)),
      |tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM c),
      |s AS (SELECT c.bin, c.n_a, c.n_b,
      |    CAST((c.n_a + 1) * 1000000 // (t.ta + 10) AS BIGINT) AS share_a_ppm,
      |    CAST((c.n_b + 1) * 1000000 // (t.tb + 10) AS BIGINT) AS share_b_ppm
      |  FROM c CROSS JOIN tot t),
      |terms AS (SELECT *,
      |    CAST(FLOOR((share_a_ppm - share_b_ppm) *
      |      ln(CAST(share_a_ppm AS DOUBLE) / share_b_ppm)) AS BIGINT)
      |      AS term_e6
      |  FROM s)
      |SELECT bin, n_a, n_b, share_a_ppm, share_b_ppm, term_e6,
      |  CAST(SUM(term_e6) OVER () AS BIGINT) AS psi_total_e6
      |FROM terms ORDER BY bin""".stripMargin

  /** q121: HLL audience overlap ([[Sketches.hllOverlap]]) — shared
    * users between every event-type pair by inclusion–exclusion over
    * register-max-merged sketches, next to the exact intersection for
    * honesty. Every register is replayed by the oracle (the shared
    * q61 hash/rho/estimate snippets), so the whole sketch path —
    * state, pairwise merge, estimate arithmetic — is hash-pinned.
    */
  def hllOverlapEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"), col("user_id"))
    val est = Sketches.hllOverlap(
      Sketches.hllState(ev, "user_id", Seq("event_type")), "event_type")
    val ua = ev.distinct()
    val exact = ua.select(col("event_type").as("ga"), col("user_id"))
      .join(ua.select(col("event_type").as("gb"), col("user_id")), Seq("user_id"))
      .where(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("exact_both"))
    est.join(exact, Seq("ga", "gb"), "left")
      .select(col("ga").as("type_a"), col("gb").as("type_b"),
        coalesce(col("exact_both"), lit(0L)).as("exact_both"),
        (floor(col("est_a") * 1e4) / 1e4).as("est_a"),
        (floor(col("est_b") * 1e4) / 1e4).as("est_b"),
        (floor(col("est_union") * 1e4) / 1e4).as("est_union"),
        (floor(col("est_intersect") * 1e4) / 1e4).as("est_intersect"))
      .orderBy("type_a", "type_b")
  }

  val hllOverlapEventsSql: String = {
    val h = duckHash60("", "user_id")
    s"""WITH b AS (
       |  SELECT event_type, $h % 64 AS bucket,
       |    ${duckHllRho(h)} AS rho
       |  FROM events),
       |st AS (
       |  SELECT event_type, bucket, MAX(rho) AS max_rho FROM b GROUP BY 1, 2),
       |single AS (
       |  SELECT event_type, $duckHllEstimate AS raw_est FROM st GROUP BY 1),
       |pairs AS (
       |  SELECT a.event_type AS ga, b.event_type AS gb
       |  FROM single a JOIN single b ON a.event_type < b.event_type),
       |ust AS (
       |  SELECT p.ga, p.gb, s.bucket, MAX(s.max_rho) AS max_rho
       |  FROM pairs p JOIN st s ON s.event_type = p.ga OR s.event_type = p.gb
       |  GROUP BY 1, 2, 3),
       |uest AS (
       |  SELECT ga, gb, $duckHllEstimate AS est_union
       |  FROM ust GROUP BY 1, 2),
       |ua AS (SELECT DISTINCT event_type, user_id FROM events),
       |x AS (
       |  SELECT a.event_type AS ga, b.event_type AS gb,
       |    CAST(COUNT(*) AS BIGINT) AS exact_both
       |  FROM ua a JOIN ua b ON a.user_id = b.user_id
       |    AND a.event_type < b.event_type
       |  GROUP BY 1, 2)
       |SELECT p.ga AS type_a, p.gb AS type_b,
       |  COALESCE(x.exact_both, 0) AS exact_both,
       |  floor(sa.raw_est * 1e4) / 1e4 AS est_a,
       |  floor(sb.raw_est * 1e4) / 1e4 AS est_b,
       |  floor(u.est_union * 1e4) / 1e4 AS est_union,
       |  floor((sa.raw_est + sb.raw_est - u.est_union) * 1e4) / 1e4
       |    AS est_intersect
       |FROM pairs p
       |  JOIN single sa ON sa.event_type = p.ga
       |  JOIN single sb ON sb.event_type = p.gb
       |  JOIN uest u ON u.ga = p.ga AND u.gb = p.gb
       |  LEFT JOIN x ON x.ga = p.ga AND x.gb = p.gb
       |ORDER BY type_a, type_b""".stripMargin
  }

  /** q122: k-fold cross-validation folds ([[Sampling.foldColumn]],
    * k=5) over documents — the per-(fold, lang) census a CV harness
    * checks before training: fold sizes, char mass, and each fold's
    * floor-ppm share of its language. Disjointness is by construction
    * (mod-k); balance is what this report audits. The oracle replays
    * the md5 fold draw bit-for-bit.
    */
  def kfoldDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Sampling.foldColumn(col("doc_id"), 5).as("fold"))
    val perLang = d.groupBy(col("lang")).agg(count(lit(1)).as("lang_n"))
    d.groupBy(col("lang"), col("fold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .join(perLang, Seq("lang"))
      .select(col("lang"), col("fold"), col("n_docs"), col("sum_chars"),
        expr("n_docs * 1000000L div lang_n").as("share_ppm"))
      .orderBy("lang", "fold")
  }

  val kfoldDocsSql: String = {
    val h = duckHash60("fold", "doc_id")
    s"""WITH d AS (
       |  SELECT doc_id, lang, n_chars, CAST($h % 5 AS INT) AS fold
       |  FROM documents),
       |pl AS (SELECT lang, COUNT(*) AS lang_n FROM d GROUP BY 1),
       |pf AS (SELECT lang, fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |  FROM d GROUP BY 1, 2)
       |SELECT pf.lang, pf.fold, pf.n_docs, pf.sum_chars,
       |  CAST(pf.n_docs * 1000000 // pl.lang_n AS BIGINT) AS share_ppm
       |FROM pf JOIN pl USING (lang) ORDER BY lang, fold""".stripMargin
  }

  /** q123: edit-distance-1 fuzzy self-join ([[FuzzyJoin.selfPairs]])
    * over customer names — deletion-neighborhood blocking (complete
    * for maxDist=1 by the SymSpell argument) + exact levenshtein
    * verify. The oracle is the brute-force all-pairs join the
    * operator provably equals.
    */
  def fuzzyCustomers(s: SparkSession, dir: String): DataFrame =
    FuzzyJoin.selfPairs(t(s, dir, "customer"), "c_custkey", "c_name")
      .orderBy("id_a", "id_b")

  val fuzzyCustomersSql: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  a.c_name AS name_a, b.c_name AS name_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin

  /** q124: top-10-plus-(others) revenue rollup ([[Rollup.topNOthers]])
    * — parts by floor-cents revenue, the (others) row DERIVED from the
    * totals (no global key sort anywhere; bounded TopKAgg picks the
    * head). The oracle ranks with the equivalent window and aggregates
    * the tail directly — agreement proves the arithmetic derivation.
    */
  def topPartsOthers(s: SparkSession, dir: String): DataFrame =
    Rollup.topNOthers(
        t(s, dir, "lineitem").select(col("l_partkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents")),
        "l_partkey", "cents", n = 10)
      .orderBy("rank")

  val topPartsOthersSql: String =
    """WITH ka AS (
      |  SELECT l_partkey AS k,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1),
      |r AS (SELECT k, v,
      |    row_number() OVER (ORDER BY v DESC, k ASC) AS rn
      |  FROM ka)
      |SELECT CAST(rn AS BIGINT) AS rank, CAST(k AS VARCHAR) AS key,
      |  v AS value_sum, CAST(1 AS BIGINT) AS n_keys
      |FROM r WHERE rn <= 10
      |UNION ALL
      |SELECT 11, '(others)', CAST(COALESCE(SUM(v), 0) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM r WHERE rn > 10
      |ORDER BY rank""".stripMargin

  /** q125: per-type discrete-median imputation ([[Stats.imputeMedian]])
    * — event values as floor-cents, nulls filled with the type's
    * percentile_disc(0.5) observed value. The oracle replays the
    * lower-median by its cume_dist definition (the q92 rule — no
    * engine quantile function trusted).
    */
  def imputeEvents(s: SparkSession, dir: String): DataFrame =
    Stats.imputeMedian(
        t(s, dir, "events").select(col("event_type"), col("event_id"), col("value")),
        Seq("event_type"), "event_id", "value")
      .orderBy("event_id")

  val imputeEventsSql: String =
    """WITH b AS (
      |  SELECT event_type, event_id,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS sv
      |  FROM events),
      |cd AS (
      |  SELECT event_type, sv,
      |    CUME_DIST() OVER (PARTITION BY event_type ORDER BY sv) AS c
      |  FROM b WHERE sv IS NOT NULL),
      |med AS (
      |  SELECT event_type, MIN(sv) AS med
      |  FROM cd WHERE c >= 0.5 GROUP BY 1)
      |SELECT b.event_type, b.event_id,
      |  COALESCE(b.sv, m.med) AS value_scaled,
      |  (b.sv IS NULL AND m.med IS NOT NULL) AS was_imputed
      |FROM b LEFT JOIN med m USING (event_type)
      |ORDER BY event_id""".stripMargin

  /** q126: frequency-ranked label dictionaries
    * ([[Encoding.labelDictionary]]) over two document vocabularies —
    * dense codes by (count DESC, value ASC), the embedding-table
    * ordering. The oracle replays both windows.
    */
  def labelDictDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Encoding.labelDictionary(d, "lang")
      .select(lit("lang").as("column"), col("value"), col("code"), col("cnt"))
      .unionByName(Encoding.labelDictionary(d, "source")
        .select(lit("source").as("column"), col("value"), col("code"), col("cnt")))
      .orderBy("column", "code")
  }

  val labelDictDocsSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", value, code, cnt FROM (
         |  SELECT CAST($c AS VARCHAR) AS value,
         |    CAST(row_number() OVER (ORDER BY COUNT(*) DESC,
         |      CAST($c AS VARCHAR) ASC) - 1 AS BIGINT) AS code,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM documents WHERE $c IS NOT NULL GROUP BY $c)""".stripMargin
    s"""${one("lang")}
       |UNION ALL
       |${one("source")}
       |ORDER BY "column", code""".stripMargin
  }

  /** q127: categorical association screen ([[Profile.association]]) —
    * MI / chi-square / Cramér's V for (lang, source) on documents and
    * (event_type, weekday) on events, one labeled row each. Integer
    * contingency tables, floor-e6 cell terms summed as longs; the
    * oracle replays the full grid including zero cells.
    */
  def associationPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val ev = t(s, dir, "events")
      .select(col("event_type"),
        expr("(ts div 86400000000000 + 4) % 7").as("dow"))
    Profile.association(docs, "lang", "source")
      .select(lit("docs:lang~source").as("pair"), col("*"))
      .unionByName(Profile.association(ev, "event_type", "dow")
        .select(lit("events:type~dow").as("pair"), col("*")))
      .orderBy("pair")
  }

  val associationPairsSql: String = {
    def one(label: String, src: String, a: String, b: String) =
      s"""SELECT '$label' AS pair, n, card_a, card_b, mi_e6, chi2_e6, dof,
         |  CASE WHEN dof > 0 AND n > 0 THEN CAST(FLOOR(
         |    sqrt((CAST(chi2_e6 AS DOUBLE) / 1000000.0) /
         |         (n * LEAST(card_a - 1, card_b - 1))) * 1000000.0)
         |    AS BIGINT) END AS cramers_v_e6
         |FROM (
         |  WITH cells AS (
         |    SELECT CAST($a AS VARCHAR) AS a, CAST($b AS VARCHAR) AS b,
         |      CAST(COUNT(*) AS BIGINT) AS nab
         |    FROM $src WHERE $a IS NOT NULL AND $b IS NOT NULL
         |    GROUP BY 1, 2),
         |  ma AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY 1),
         |  mb AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY 1),
         |  tot AS (SELECT CAST(SUM(nab) AS BIGINT) AS n FROM cells),
         |  grid AS (
         |    SELECT ma.na, mb.nb, t.n, COALESCE(c.nab, 0) AS nab
         |    FROM ma CROSS JOIN mb
         |      LEFT JOIN cells c ON c.a = ma.a AND c.b = mb.b
         |      CROSS JOIN tot t),
         |  terms AS (
         |    SELECT n,
         |      CASE WHEN nab > 0 THEN CAST(FLOOR(
         |        (CAST(nab AS DOUBLE) / n) *
         |        ln(CAST(nab AS DOUBLE) * n / (CAST(na AS DOUBLE) * nb)) *
         |        1000000.0) AS BIGINT) ELSE 0 END AS mi_t,
         |      CAST(FLOOR((nab - CAST(na AS DOUBLE) * nb / n) *
         |        (nab - CAST(na AS DOUBLE) * nb / n) /
         |        (CAST(na AS DOUBLE) * nb / n) * 1000000.0) AS BIGINT) AS chi_t
         |    FROM grid),
         |  cards AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ma) AS card_a,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM mb) AS card_b)
         |  SELECT COALESCE(MAX(t2.n), 0) AS n, cards.card_a, cards.card_b,
         |    COALESCE(CAST(SUM(t2.mi_t) AS BIGINT), 0) AS mi_e6,
         |    COALESCE(CAST(SUM(t2.chi_t) AS BIGINT), 0) AS chi2_e6,
         |    GREATEST(cards.card_a - 1, 0) * GREATEST(cards.card_b - 1, 0) AS dof
         |  FROM terms t2 CROSS JOIN cards
         |  GROUP BY cards.card_a, cards.card_b)""".stripMargin
    s"""${one("docs:lang~source", "documents", "lang", "source")}
       |UNION ALL
       |${one("events:type~dow", "events",
         "event_type", "(epoch_ns(ts) // 86400000000000 + 4) % 7")}
       |ORDER BY pair""".stripMargin
  }

  /** q128: rolling-window outlier monitor ([[Stats.rollingOutliers]])
    * — daily floor-dollar revenue per priority vs its own trailing
    * 30-day baseline (self-excluded), flags via the squared integer
    * comparison (no sqrt, no floats anywhere). The oracle replays the
    * identical ROWS frames and inequality.
    */
  def rollingRevenueOutliers(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("k"),
        to_date(col("o_orderdate")).as("t"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("x"))
    Stats.rollingOutliers(daily, "k", "t", "x",
        window = 30, kTenths = 25)
      .orderBy("k", "t")
  }

  val rollingRevenueOutliersSql: String =
    """WITH d AS (
      |  SELECT o_orderpriority AS k, CAST(o_orderdate AS DATE) AS t,
      |    CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2),
      |f AS (
      |  SELECT k, t, x,
      |    COUNT(x) OVER w AS n, SUM(x) OVER w AS s, SUM(x * x) OVER w AS ss
      |  FROM d WINDOW w AS (PARTITION BY k ORDER BY t
      |    ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
      |SELECT k, t, x, CAST(n AS BIGINT) AS baseline_rows,
      |  CASE WHEN n >= 8 AND x IS NOT NULL THEN
      |    (n * x - s) * (n * x - s) * 100 > 625 * (n * ss - s * s)
      |  END AS is_outlier
      |FROM f ORDER BY k, t""".stripMargin

  /** q129: conversion-latency distribution
    * ([[Behavior.conversionLatency]]) — first view → first purchase
    * per user, summarized with exact discrete percentiles (observed
    * microsecond values — the µs-truncated shared timeline, q37 rule, no interpolation). The oracle replays the
    * conditional mins and the cume_dist lower-percentile rule.
    */
  def conversionLatencyEvents(s: SparkSession, dir: String): DataFrame = {
    val lat = Behavior.conversionLatency(
      t(s, dir, "events").withColumn("ts", expr("ts div 1000")),
      "user_id", "ts", col("event_type") === "view",
      col("event_type") === "purchase")
    lat.agg(count(lit(1)).as("n_converted"),
      min(col("latency")).as("min_us"),
      expr("cast(percentile_disc(0.25) WITHIN GROUP (ORDER BY latency) as long)")
        .as("p25_us"),
      expr("cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY latency) as long)")
        .as("p50_us"),
      expr("cast(percentile_disc(0.75) WITHIN GROUP (ORDER BY latency) as long)")
        .as("p75_us"),
      expr("cast(percentile_disc(0.9) WITHIN GROUP (ORDER BY latency) as long)")
        .as("p90_us"),
      max(col("latency")).as("max_us"))
  }

  val conversionLatencySql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) // 1000 END) AS f,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000 END) AS p
      |  FROM events GROUP BY 1),
      |lat AS (
      |  SELECT p - f AS latency FROM u
      |  WHERE f IS NOT NULL AND p IS NOT NULL AND p > f),
      |cd AS (
      |  SELECT latency, CUME_DIST() OVER (ORDER BY latency) AS c FROM lat)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lat) AS n_converted,
      |  (SELECT CAST(MIN(latency) AS BIGINT) FROM lat) AS min_us,
      |  (SELECT CAST(MIN(latency) AS BIGINT) FROM cd WHERE c >= 0.25) AS p25_us,
      |  (SELECT CAST(MIN(latency) AS BIGINT) FROM cd WHERE c >= 0.5) AS p50_us,
      |  (SELECT CAST(MIN(latency) AS BIGINT) FROM cd WHERE c >= 0.75) AS p75_us,
      |  (SELECT CAST(MIN(latency) AS BIGINT) FROM cd WHERE c >= 0.9) AS p90_us,
      |  (SELECT CAST(MAX(latency) AS BIGINT) FROM lat) AS max_us""".stripMargin

  /** q130: revenue concentration ([[Profile.concentration]]) — Gini
    * coefficient and head shares of part revenue in floor-dollars
    * (coarse units keep n·Σx inside the documented 64-bit bound).
    * The oracle replays both ranking windows and the rational Gini.
    */
  def revenueConcentration(s: SparkSession, dir: String): DataFrame =
    Profile.concentration(
      t(s, dir, "lineitem").select(col("l_partkey"),
        floor(col("l_extendedprice")).cast("long").as("dollars")),
      "l_partkey", "dollars")

  val revenueConcentrationSql: String =
    """WITH ka AS (
      |  SELECT l_partkey AS k,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT v,
      |    CAST(row_number() OVER (ORDER BY v ASC, k ASC) AS BIGINT) AS i,
      |    CAST(row_number() OVER (ORDER BY v DESC, k ASC) AS BIGINT) AS rr,
      |    (COUNT(*) OVER () * 10 + 99) // 100 AS headn
      |  FROM ka),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    CAST(SUM(v) AS BIGINT) AS total,
      |    CAST(SUM(i * v) AS BIGINT) AS s1,
      |    CAST(MAX(v) AS BIGINT) AS vmax,
      |    CAST(SUM(CASE WHEN rr <= headn THEN v ELSE 0 END) AS BIGINT) AS head
      |  FROM r)
      |SELECT n_keys, total,
      |  CASE WHEN n_keys > 1 AND total > 0 THEN
      |    (2 * s1 - (n_keys + 1) * total) * 1000000 // (n_keys * total)
      |  END AS gini_ppm,
      |  CASE WHEN total > 0 THEN vmax * 1000000 // total END AS top1_ppm,
      |  CASE WHEN total > 0 THEN head * 1000000 // total END AS top10pct_ppm
      |FROM s""".stripMargin

  /** q131: rolling 7-day distinct users ([[Sketches.hllRolling]]) —
    * per (event_type, day), the HLL estimate over that day's and the
    * prior 6 days' registers (register-max day-join, no raw rescan),
    * next to the exact windowed distinct for honesty. Every register
    * is replayed by the oracle via the same day expansion.
    */
  def rollingDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"), col("user_id"),
      expr("ts div 86400000000000").as("day"))
    val est = Sketches.hllRolling(
      Sketches.hllState(ev, "user_id", Seq("event_type", "day")),
      Seq("event_type"), "day", windowDays = 7)
    val pairs = ev.distinct()
    val days = pairs.select(col("event_type"), col("day")).distinct()
    val exact = pairs.as("p")
      .join(days.as("d"),
        col("p.event_type") === col("d.event_type") &&
          col("p.day") <= col("d.day") && col("p.day") > col("d.day") - 7)
      .groupBy(col("d.event_type").as("event_type"), col("d.day").as("day"))
      .agg(countDistinct(col("p.user_id")).as("exact_7d"))
    exact.join(est, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("exact_7d"),
        col("buckets_hit"),
        (floor(col("raw_est") * 1e4) / 1e4).as("hll_7d"))
      .orderBy("event_type", "day")
  }

  val rollingDistinctUsersSql: String = {
    val h = duckHash60("", "user_id")
    s"""WITH ev AS (
       |  SELECT event_type, user_id,
       |    epoch_ns(ts) // 86400000000000 AS day
       |  FROM events),
       |b AS (
       |  SELECT event_type, day, $h % 64 AS bucket,
       |    ${duckHllRho(h)} AS rho
       |  FROM ev),
       |st AS (
       |  SELECT event_type, day, bucket, MAX(rho) AS max_rho
       |  FROM b GROUP BY 1, 2, 3),
       |days AS (SELECT DISTINCT event_type, day FROM st),
       |expanded AS (
       |  SELECT d.event_type, d.day, s.bucket, MAX(s.max_rho) AS max_rho
       |  FROM st s JOIN days d ON s.event_type = d.event_type
       |    AND s.day <= d.day AND s.day > d.day - 7
       |  GROUP BY 1, 2, 3),
       |est AS (
       |  SELECT event_type, day, CAST(COUNT(*) AS INT) AS buckets_hit,
       |    $duckHllEstimate AS raw_est
       |  FROM expanded GROUP BY 1, 2),
       |pairs AS (SELECT DISTINCT event_type, user_id, day FROM ev),
       |x AS (
       |  SELECT d.event_type, d.day,
       |    CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS exact_7d
       |  FROM pairs p JOIN days d ON p.event_type = d.event_type
       |    AND p.day <= d.day AND p.day > d.day - 7
       |  GROUP BY 1, 2)
       |SELECT x.event_type, CAST(x.day AS BIGINT) AS day, x.exact_7d,
       |  e.buckets_hit, floor(e.raw_est * 1e4) / 1e4 AS hll_7d
       |FROM x JOIN est e ON x.event_type = e.event_type AND x.day = e.day
       |ORDER BY 1, 2""".stripMargin
  }

  /** q132: join-cardinality planner ([[Profile.joinCardinality]]) —
    * the exact output size and dominating keys of the lineitem
    * self-join on l_partkey, priced from key histograms without
    * running the join. The oracle replays the products and the
    * (pair_rows DESC, key ASC) head.
    */
  def joinCardinalityParts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey"))
    Profile.joinCardinality(li, li, "l_partkey", "l_partkey", topK = 10)
      .orderBy("rank")
  }

  val joinCardinalityPartsSql: String =
    """WITH c AS (
      |  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1),
      |prod AS (SELECT key, n * n AS pair_rows FROM c),
      |tot AS (SELECT CAST(SUM(pair_rows) AS BIGINT) AS total_pair_rows,
      |    CAST(COUNT(*) AS BIGINT) AS n_matched_keys FROM prod),
      |r AS (SELECT key, pair_rows,
      |    CAST(row_number() OVER (ORDER BY pair_rows DESC, key ASC)
      |      AS BIGINT) AS rank
      |  FROM prod)
      |SELECT r.rank, r.key, r.pair_rows,
      |  CASE WHEN t.total_pair_rows > 0 THEN
      |    r.pair_rows * 1000000 // t.total_pair_rows END AS share_ppm,
      |  t.total_pair_rows, t.n_matched_keys
      |FROM r CROSS JOIN tot t WHERE r.rank <= 10 ORDER BY r.rank""".stripMargin

  /** q133: hybrid-retrieval rank fusion ([[Retrieval.rrfFuse]]) — the
    * RAG retrieval stack end to end: the q113 BM25 ranking and a
    * brute-force cosine ranking over the embedding table, fused with
    * floor-e6 reciprocal-rank scores into one consensus top-10. The
    * oracle replays BOTH retrievers (the q113 double chain, the q23
    * cosine window) and the integer fusion, so the fused ordering —
    * not just each side — is hash-verified.
    */
  def hybridSearch(s: SparkSession, dir: String): DataFrame = {
    val bm = TextAnalysis.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        bm25Queries, 20)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    val e = t(s, dir, "embeddings")
    val em = Similarity.bruteForceTopK(e,
        e.where(col("vec_id").isin(1L, 2L)), "vec_id", "embedding", 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("rnk"))
    Retrieval.rrfFuse(Seq(bm, em), k0 = 60, topK = 10)
      .orderBy("query_id", "fused_rank")
  }

  val hybridSearchSql: String = {
    val qtRows = bm25Queries.flatMap { case (qid, text) =>
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
        .map(term => s"($qid, '$term')")
    }.mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($duckToks) AS term
       |  FROM documents WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
       |qt(query_id, term) AS (VALUES $qtRows),
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
       |bmagg AS (SELECT query_id, doc_id, CAST(SUM(e6) AS BIGINT) AS score_e6
       |  FROM scored GROUP BY query_id, doc_id),
       |bm AS (SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_e6 DESC, doc_id ASC) AS rnk
       |  FROM bmagg),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id, v FROM e WHERE vec_id IN (1, 2)),
       |cscored AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
       |    COALESCE(list_dot_product(q.v, e.v) /
       |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))),
       |      0.0) AS cos
       |  FROM q JOIN e ON e.vec_id <> q.vec_id),
       |em AS (SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, doc_id ASC) AS rnk
       |  FROM cscored),
       |contrib AS (
       |  SELECT query_id, doc_id, 1000000 // (60 + rnk) AS e6
       |  FROM bm WHERE rnk <= 20
       |  UNION ALL
       |  SELECT query_id, doc_id, 1000000 // (60 + rnk) AS e6
       |  FROM em WHERE rnk <= 20),
       |fused AS (SELECT query_id, doc_id, CAST(SUM(e6) AS BIGINT) AS rrf_e6,
       |    CAST(COUNT(*) AS BIGINT) AS n_rankers
       |  FROM contrib GROUP BY 1, 2),
       |fr AS (SELECT query_id, doc_id, rrf_e6, n_rankers,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY rrf_e6 DESC, doc_id ASC) AS fused_rank
       |  FROM fused)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |  CAST(fused_rank AS BIGINT) AS fused_rank, doc_id, rrf_e6, n_rankers
       |FROM fr WHERE fused_rank <= 10 ORDER BY query_id, fused_rank""".stripMargin
  }

  /** q134: leave-one-out target encoding
    * ([[Encoding.targetEncodeLoo]]) — each order's priority class
    * encoded by the mean total price of the OTHER orders in that
    * class. The oracle replays the exact decimal sums and the
    * integer floor-division, so every held-out mean matches
    * bit-for-bit.
    */
  def targetEncodeOrders(s: SparkSession, dir: String): DataFrame =
    Encoding.targetEncodeLoo(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice")),
        "o_orderpriority", "o_totalprice")
      .select(col("o_orderkey"), col("o_orderpriority"), col("n_key"),
        col("loo_e6"))
      .orderBy("o_orderkey")

  val targetEncodeOrdersSql: String =
    """WITH y AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,4)) * 10000 AS BIGINT) AS y4
      |  FROM orders),
      |s AS (
      |  SELECT o_orderpriority, COUNT(y4) AS n_key,
      |    CAST(SUM(y4) AS BIGINT) AS s4
      |  FROM y GROUP BY 1)
      |SELECT y.o_orderkey, y.o_orderpriority, s.n_key,
      |  CASE WHEN y.y4 IS NOT NULL AND s.n_key > 1 THEN
      |    ((s.s4 - y.y4) * 100) // (s.n_key - 1)
      |  WHEN y.y4 IS NULL AND s.n_key > 0 THEN
      |    (s.s4 * 100) // s.n_key END AS loo_e6
      |FROM y JOIN s ON y.o_orderpriority IS NOT DISTINCT FROM s.o_orderpriority
      |ORDER BY y.o_orderkey""".stripMargin

  /** q135: Bloom-pruned dimension join ([[Sketches.bloomPrune]]) — the
    * runtime-filter pattern made explicit: lineitems are pre-filtered
    * through a bloom of nation-3 suppliers' keys (k shuffle-free
    * broadcast semi-joins) BEFORE the exact join, so at scale the join
    * shuffle only sees surviving rows. The oracle is the PLAIN join —
    * agreement proves the bloom dropped nothing real and the exact
    * join scrubbed every false positive.
    */
  def bloomPrunedRevenue(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "supplier")
      .where(col("s_nationkey") === 3)
      .select(col("s_suppkey"), col("s_name"))
    val fact = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val pruned = Sketches.bloomPrune(
      Sketches.bloomBits(dim, "s_suppkey"), fact, "l_suppkey")
    pruned.join(dim, pruned("l_suppkey") === dim("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          lit(100.0)).cast("long")).as("rev_cents"),
        count(lit(1)).as("n_items"))
      .orderBy("s_suppkey")
  }

  val bloomPrunedRevenueSql: String =
    """SELECT s.s_suppkey, s.s_name,
      |  CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
      |    AS BIGINT)) AS BIGINT) AS rev_cents,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |WHERE s.s_nationkey = 3
      |GROUP BY 1, 2 ORDER BY s.s_suppkey""".stripMargin

  /** q136: PMI collocations ([[TextAnalysis.pmiPairs]]) — document-level
    * term co-occurrence with both fan-out knobs (minDf vocabulary
    * prune, maxTermsPerDoc outlier skip) replayed by the oracle, plus
    * the floor-e6 ln with the one shared parenthesization.
    */
  def pmiDocuments(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiPairs(t(s, dir, "documents"), "doc_id", "text",
        minDf = 20, maxTermsPerDoc = 400)
      .orderBy("term_a", "term_b")

  val pmiDocumentsSql: String =
    s"""WITH dt AS (
       |  SELECT DISTINCT doc_id, term FROM (
       |    SELECT doc_id, unnest($duckToks) AS term
       |    FROM documents WHERE text IS NOT NULL)),
       |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dt),
       |v AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY 1
       |      HAVING COUNT(*) >= 20),
       |k AS (SELECT dt.doc_id, dt.term, v.df FROM dt JOIN v USING (term)),
       |sz AS (SELECT doc_id FROM k GROUP BY 1 HAVING COUNT(*) <= 400),
       |kk AS (SELECT k.* FROM k JOIN sz USING (doc_id)),
       |p AS (
       |  SELECT a.term AS term_a, b.term AS term_b,
       |    a.df AS n_a, b.df AS n_b, COUNT(*) AS n_ab
       |  FROM kk a JOIN kk b ON a.doc_id = b.doc_id AND a.term < b.term
       |  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 20)
       |SELECT term_a, term_b, CAST(n_a AS BIGINT) AS n_a,
       |  CAST(n_b AS BIGINT) AS n_b, CAST(n_ab AS BIGINT) AS n_ab,
       |  CAST(FLOOR(ln(CAST(n_ab * n_docs AS DOUBLE) /
       |    CAST(n_a * n_b AS DOUBLE)) * 1000000.0) AS BIGINT) AS pmi_e6
       |FROM p CROSS JOIN nd ORDER BY term_a, term_b""".stripMargin

  /** q137: BM25 through the FULL persisted-index lifecycle
    * ([[IndexStore.saveTextIndex]]/append/load +
    * [[TextAnalysis.bm25TopKIndexed]]): build+save the inverted index
    * from part of the corpus, APPEND the rest, load, probe. Oracle =
    * q113's whole-corpus BM25 replay — the persisted path must
    * hash-match the inline build, the append ≡ rebuild invariant on
    * the lexical index.
    */
  def bm25IndexLoad(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = scratchDir("text_idx")
    IndexStore.saveTextIndex(docs.where(col("doc_id") < 300),
      "doc_id", "text", path)
    IndexStore.appendTextIndex(docs.where(col("doc_id") >= 300),
      "doc_id", "text", path)
    TextAnalysis.bm25TopKIndexed(IndexStore.loadTextIndex(s, path),
        bm25Queries, 10)
      .orderBy("query_id", "rnk")
  }
}
