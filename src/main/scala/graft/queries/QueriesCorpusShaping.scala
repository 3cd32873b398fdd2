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
private[graft] trait QueriesCorpusShaping { this: Queries.type =>
  // ------------------------------------------------------- corpus shaping 2
  /** Sliding-window chunking ([[CorpusPrep.chunk]]): 50-token windows
    * every 40 tokens (10-token overlap) — the pre-tokenization step
    * that turns documents into training sequences. Narrow (tokenize +
    * arithmetic explode, no shuffle before the sort); the oracle
    * replays window arithmetic, slicing, and the md5 chunk fingerprint.
    */
  def docChunks(s: SparkSession, dir: String): DataFrame =
    CorpusPrep.chunk(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 50, overlap = 10)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "chunk_idx")

  val docChunksSql: String =
    s"""WITH tok AS (SELECT doc_id, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |t2 AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
       |k AS (SELECT doc_id, toks, n,
       |        (greatest(n - 10, 1) + 39) // 40 AS n_chunks FROM t2),
       |c AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_idx FROM k),
       |sl AS (SELECT doc_id, chunk_idx,
       |         toks[chunk_idx * 40 + 1 : chunk_idx * 40 + 50] AS chunk FROM c)
       |SELECT doc_id, chunk_idx, CAST(len(chunk) AS INT) AS chunk_len,
       |  md5(array_to_string(chunk, ' ')) AS chunk_fp
       |FROM sl ORDER BY doc_id, chunk_idx""".stripMargin

  /** q281: cross-document BOILERPLATE LINE removal
    * ([[CorpusPrep.stripBoilerplateLines]] — the CCNet/RefinedWeb
    * line-dedup move). The corpus text carries no newlines, so the
    * query CONSTRUCTS the lined shape a web extraction produces:
    * every doc = a universal copyright header + two/three lines of
    * its own tokens + (on doc_id ≡ 0 mod 3) a "subscribe" footer —
    * then strips lines whose trimmed form appears in ≥ 50 distinct
    * docs. The header (df = all docs) and footer (df ≈ N/3) vanish
    * everywhere; token lines (near-dup families ≤ ~20 docs) survive
    * byte-for-byte in order. Oracle: the line construction replayed
    * as string concatenation over the same token slices, then the
    * full strip algorithm (positions, trimmed keys, distinct-doc df,
    * ordered reassembly, empty-line formatting rule) in SQL.
    */
  def boilerplateLines(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val lined = t(s, dir, "documents").where(col("text").isNotNull)
      .select(col("doc_id"), concat_ws("\n",
        lit("copyright corp all rights reserved"),
        array_join(slice(toks, 1, 8), " "),
        when(pmod(col("doc_id"), lit(3)) === 0,
          lit("subscribe to our newsletter"))
          .otherwise(array_join(slice(toks, 9, 8), " ")),
        array_join(slice(toks, 17, 8), " ")).as("text"))
    CorpusPrep.stripBoilerplateLines(lined, "doc_id", "text", minDocs = 50)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val boilerplateLinesSql: String =
    s"""WITH tok AS (SELECT doc_id, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |lined AS (SELECT doc_id,
       |    'copyright corp all rights reserved' || chr(10) ||
       |    COALESCE(array_to_string(toks[1:8], ' '), '') || chr(10) ||
       |    CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter'
       |         ELSE COALESCE(array_to_string(toks[9:16], ' '), '') END
       |      || chr(10) ||
       |    COALESCE(array_to_string(toks[17:24], ' '), '') AS text
       |  FROM tok),
       |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM lined),
       |ln AS (SELECT doc_id, pos, l[pos] AS line, trim(l[pos]) AS k
       |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS pos
       |        FROM ls)),
       |boiler AS (SELECT k FROM ln WHERE k <> ''
       |  GROUP BY k HAVING COUNT(DISTINCT doc_id) >= 50),
       |flagged AS (SELECT ln.doc_id, ln.pos, ln.line,
       |    (ln.k = '' OR b.k IS NULL) AS keep
       |  FROM ln LEFT JOIN boiler b ON b.k = ln.k),
       |txt AS (SELECT doc_id,
       |    array_to_string(list(line ORDER BY pos), chr(10)) AS text
       |  FROM flagged WHERE keep GROUP BY doc_id),
       |cnt AS (SELECT doc_id,
       |    CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
       |    CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed
       |  FROM flagged GROUP BY doc_id)
       |SELECT c.doc_id, COALESCE(t.text, '') AS text, c.n_kept,
       |  c.n_removed
       |FROM cnt c LEFT JOIN txt t USING (doc_id)
       |ORDER BY c.doc_id""".stripMargin

  /** q284: WITHIN-document repeated-line removal
    * ([[CorpusPrep.dedupLinesWithinDoc]] — the intra-doc twin of
    * q281): docs constructed so every doc_id ≡ 0 mod 2 repeats its
    * first token line verbatim and every doc_id ≡ 0 mod 3 repeats a
    * padded variant (trim-equal — must also drop) with an empty
    * formatting line between. Oracle: the construction + the
    * first-occurrence-by-position rule (row_number over (doc, trimmed
    * key) ordered by pos) + ordered byte-exact reassembly.
    */
  def dedupLinesQuery(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val l1 = array_join(slice(toks, 1, 8), " ")
    val lined = t(s, dir, "documents").where(col("text").isNotNull)
      .select(col("doc_id"), concat_ws("\n",
        l1,
        when(pmod(col("doc_id"), lit(2)) === 0, l1)
          .otherwise(array_join(slice(toks, 9, 8), " ")),
        lit(""),
        when(pmod(col("doc_id"), lit(3)) === 0, concat(lit("  "), l1))
          .otherwise(array_join(slice(toks, 17, 8), " "))).as("text"))
    CorpusPrep.dedupLinesWithinDoc(lined, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val dedupLinesSql: String =
    s"""WITH tok AS (SELECT doc_id, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |lined AS (SELECT doc_id,
       |    COALESCE(array_to_string(toks[1:8], ' '), '') || chr(10) ||
       |    CASE WHEN doc_id % 2 = 0
       |         THEN COALESCE(array_to_string(toks[1:8], ' '), '')
       |         ELSE COALESCE(array_to_string(toks[9:16], ' '), '') END
       |      || chr(10) || chr(10) ||
       |    CASE WHEN doc_id % 3 = 0
       |         THEN '  ' || COALESCE(array_to_string(toks[1:8], ' '), '')
       |         ELSE COALESCE(array_to_string(toks[17:24], ' '), '') END
       |      AS text
       |  FROM tok),
       |ln AS (SELECT doc_id, pos, l[pos] AS line, trim(l[pos]) AS k
       |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS pos
       |        FROM (SELECT doc_id, string_split(text, chr(10)) AS l
       |              FROM lined))),
       |flagged AS (SELECT doc_id, pos, line,
       |    (k = '' OR row_number() OVER (PARTITION BY doc_id, k
       |       ORDER BY pos) = 1) AS keep
       |  FROM ln),
       |txt AS (SELECT doc_id,
       |    array_to_string(list(line ORDER BY pos), chr(10)) AS text
       |  FROM flagged WHERE keep GROUP BY doc_id),
       |cnt AS (SELECT doc_id,
       |    CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
       |    CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed
       |  FROM flagged GROUP BY doc_id)
       |SELECT c.doc_id, COALESCE(t.text, '') AS text, c.n_kept,
       |  c.n_removed
       |FROM cnt c LEFT JOIN txt t USING (doc_id)
       |ORDER BY c.doc_id""".stripMargin

  /** Benchmark decontamination ([[Dedup.ngramContamination]]): corpus
    * docs (id >= 100) sharing any complete 8-token n-gram with the
    * "benchmark" slice (id < 100) — exact distinct-gram equi-join, the
    * eval side broadcast-sized by construction. 13 contaminated docs on
    * this fixture (the corpus's planted near-dups of eval docs carry
    * whole shared passages).
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.ngramContamination(
        docs.where(col("doc_id") >= 100), docs.where(col("doc_id") < 100),
        "doc_id", "text", shingleSize = 8, minHits = 1)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** DuckDB twin of `TextFunctions.shingles(text, n)` over a `toks`
    * column: distinct space-joined n-grams, one PARTIAL gram for docs
    * shorter than n (the kernel's short-doc behavior — harmless in the
    * decontamination joins because a partial gram can never equal a
    * full one). Single definition for every gram-replaying oracle.
    */
  private[graft] def duckGrams(n: Int): String =
    s"list_distinct([array_to_string(toks[i:i+${n - 1}], ' ') " +
      s"for i in range(1, greatest(len(toks) - ${n - 1}, 1) + 1)])"

  /** q283: contamination at SPAN grain
    * ([[Dedup.ngramContaminationSpans]]) — the q68 screen upgraded to
    * the audit question: against WHICH eval doc, HOW MANY overlapping
    * 8-token windows, and the minimal corpus token slice
    * [first_pos, last_pos] containing them. Oracle: positional window
    * generation + the per-eval distinct-gram join + min/max/count
    * replayed exactly.
    */
  def decontaminateSpans(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.ngramContaminationSpans(
        docs.where(col("doc_id") >= 100), docs.where(col("doc_id") < 100),
        "doc_id", "text", shingleSize = 8, minHits = 1)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "eval_id")
  }

  val decontaminateSpansSql: String =
    s"""WITH tok AS (SELECT doc_id, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |t2 AS (SELECT doc_id, toks FROM tok WHERE len(toks) >= 8),
       |cw AS (SELECT doc_id, pos,
       |    array_to_string(toks[pos:pos + 7], ' ') AS g
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(1, len(toks) - 7 + 1)) AS pos
       |        FROM t2 WHERE doc_id >= 100)),
       |ev AS (SELECT doc_id AS eval_id, unnest(${duckGrams(8)}) AS g
       |  FROM t2 WHERE doc_id < 100)
       |SELECT c.doc_id, e.eval_id, CAST(COUNT(*) AS BIGINT) AS hits,
       |  CAST(MIN(c.pos) AS BIGINT) AS first_pos,
       |  CAST(MAX(c.pos) + 7 AS BIGINT) AS last_pos
       |FROM cw c JOIN ev e USING (g)
       |GROUP BY c.doc_id, e.eval_id HAVING COUNT(*) >= 1
       |ORDER BY c.doc_id, e.eval_id""".stripMargin

  val decontaminateSql: String =
    s"""WITH tok AS (SELECT doc_id, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |t2 AS (SELECT doc_id, toks FROM tok WHERE len(toks) >= 8),
       |sh AS (SELECT doc_id, unnest(${duckGrams(8)}) AS g FROM t2),
       |evg AS (SELECT DISTINCT g FROM sh WHERE doc_id < 100)
       |SELECT s.doc_id, COUNT(*) AS hits
       |FROM sh s JOIN evg USING (g) WHERE s.doc_id >= 100
       |GROUP BY s.doc_id HAVING COUNT(*) >= 1
       |ORDER BY doc_id""".stripMargin

  /** Quality-WEIGHTED deterministic sampling + train/val/test split
    * ([[Sampling.weightedHashSample]]/[[Sampling.splitColumn]]): keep a
    * doc with probability equal to its quality score (the mixture-
    * weighting move beyond q59's flat per-stratum rates), then assign
    * kept docs to stable 80/10/10 splits by a second salted hash — a
    * doc never migrates between splits as the corpus grows. The draw is
    * hash60/2^60 (exact power-of-two division), so the oracle replays
    * both decisions bit-for-bit from the shared quality fragments.
    */
  def weightedSplit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").where(col("text").isNotNull)
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
    Sampling.weightedHashSample(d, "doc_id", col("quality"), salt = "wq")
      .select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
      .orderBy("doc_id")
  }

  val weightedSplitSql: String = {
    val draw = s"CAST(${duckHash60("wq", "doc_id")} AS DOUBLE) / 1152921504606846976"
    val bucket = s"${duckHash60("split", "doc_id")} % 100"
    s"""WITH tok AS (SELECT doc_id, text, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |m AS (
       |  SELECT doc_id, text,
       |    $punctStopSqlExprs
       |  FROM tok),
       |q AS (
       |  SELECT doc_id, $qualitySqlExpr AS quality FROM m),
       |kept AS (
       |  -- the OR mirrors weightedHashSample's prob >= 1 certainty arm
       |  SELECT doc_id, $bucket AS b FROM q
       |  WHERE $draw < quality OR quality >= 1.0)
       |SELECT doc_id,
       |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |FROM kept ORDER BY doc_id""".stripMargin
  }

  /** THE capstone: the full training-data release pipeline in one
    * query — gate + fingerprint-dedup ([[CorpusPrep.clean]]) →
    * benchmark decontamination ([[Dedup.ngramContamination]],
    * anti-join release) → sliding-window chunking
    * ([[CorpusPrep.chunk]]) → per-language sequence accounting. Every
    * stage is an already-oracled operator (q58/q68/q67) and the oracle
    * replays the WHOLE composition from the shared SQL fragments, so
    * the end-to-end path — not just the stages — is hash-verified.
    * Scale shape: one corpus scan feeds the gate, one fp shuffle, one
    * gram aggregation against the broadcast-sized eval set, one narrow
    * chunk explode, one final aggregation.
    */
  def pipelineRelease(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.where(col("doc_id") >= 100)
    val eval = docs.where(col("doc_id") < 100)
    // materialize the survivor set ONCE: both downstream consumers
    // (gram build and release anti-join) would otherwise recompute the
    // whole gate+dedup subtree — at corpus scale that is a second full
    // scan, and the survivor relation is the small post-gate remnant
    val cleaned = CorpusPrep.clean(corpus, "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("text")).localCheckpoint()
    val dirty = Dedup.ngramContamination(cleaned, eval, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
    val released = cleaned.join(dirty, Seq("doc_id"), "left_anti")
    CorpusPrep.chunk(released, "doc_id", "text", carryCols = Seq("lang"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len").cast("long")).as("chunk_tokens"))
      .orderBy("lang")
  }

  val pipelineReleaseSql: String =
    s"""WITH ${cleanReplayCtes(" AND doc_id >= 100")},
       |evg AS (
       |  SELECT DISTINCT unnest(${duckGrams(8)}) AS g
       |  FROM (SELECT $duckToks AS toks FROM documents
       |        WHERE text IS NOT NULL AND doc_id < 100)
       |  WHERE len(toks) >= 8),
       |sg AS (
       |  SELECT doc_id, unnest(${duckGrams(8)}) AS g FROM s),
       |dirty AS (
       |  SELECT DISTINCT sg.doc_id FROM sg JOIN evg USING (g)),
       |rel AS (
       |  SELECT * FROM s WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
       |k AS (
       |  SELECT doc_id, lang, toks,
       |    (greatest(n_tokens - 10, 1) + 39) // 40 AS n_chunks
       |  FROM rel),
       |c AS (
       |  SELECT doc_id, lang,
       |    len(toks[chunk_idx * 40 + 1 : chunk_idx * 40 + 50]) AS chunk_len
       |  FROM (SELECT doc_id, lang, toks, unnest(range(n_chunks)) AS chunk_idx FROM k))
       |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
       |  CAST(SUM(chunk_len) AS BIGINT) AS chunk_tokens
       |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  /** q91: q70's release pipeline written ENTIRELY in `spark.sql` — the
    * proof that a SQL-first user can run the flagship composition (gate
    * → fingerprint dedup → decontamination → chunking → accounting)
    * without touching the Scala API. Text kernels are spelled in SQL
    * (the quality/lang formulas are deliberately SQL-expressible, the
    * repo's own oracle-replayability rule) and the 8-gram build uses
    * the INJECTED native function `graft_shingles` (GraftExtensions) —
    * the custom-expression SQL surface carrying the flagship path.
    * Same oracle as q70: the two must hash-identically.
    */
  def pipelineSqlTwin(s: SparkSession, dir: String): DataFrame = {
    GraftExtensions.register(s) // idempotent; covers bare sessions
    t(s, dir, "documents").createOrReplaceTempView("graft_docs_v")
    val stop10 = TextFunctions.StopwordsEn.map(w => s"'$w'").mkString(", ")
    val langCnt = TextFunctions.LangStopwords.map { case (code, ws) =>
      s"size(filter(toks, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS c_$code"
    }.mkString(",\n    ")
    s.sql(
      s"""WITH tok AS (
         |  SELECT doc_id, lang, text,
         |    filter(split(lower(trim(text)), '\\\\s+'), x -> length(x) > 0) AS toks
         |  FROM graft_docs_v WHERE text IS NOT NULL AND doc_id >= 100),
         |m AS (
         |  SELECT *, size(toks) AS n_tokens,
         |    round(CAST(regexp_count(text, '[^A-Za-z0-9\\\\s]') AS DOUBLE) /
         |          greatest(length(text), 1), 4) AS punct,
         |    size(filter(toks, x -> x IN ($stop10))) AS stop_n,
         |    $langCnt
         |  FROM tok),
         |q AS (
         |  SELECT doc_id, lang, text, toks, n_tokens,
         |    CAST(floor((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5 +
         |      least(round(CAST(stop_n AS DOUBLE) / greatest(n_tokens, 1), 4) * 5.0, 1.0) * 0.3 +
         |      (1.0 - punct) * 0.2) * 10000) AS DOUBLE) / 10000 AS quality,
         |    CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
         |         WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es'
         |         WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
         |         WHEN c_fr > 0 THEN 'fr' ELSE 'und' END AS lang_guess
         |  FROM m),
         |f AS (
         |  SELECT *, md5(concat_ws(' ', array_sort(array_distinct(toks)))) AS fp
         |  FROM q WHERE n_tokens >= 10 AND quality >= 0.3 AND lang_guess <> 'und'),
         |s AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
         |    FROM f) WHERE rn = 1),
         |evg AS (
         |  SELECT DISTINCT explode(graft_shingles(text, 8)) AS g
         |  FROM graft_docs_v
         |  WHERE text IS NOT NULL AND doc_id < 100
         |    AND size(filter(split(lower(trim(text)), '\\\\s+'),
         |             x -> length(x) > 0)) >= 8),
         |sg AS (SELECT doc_id, explode(graft_shingles(text, 8)) AS g FROM s),
         |dirty AS (SELECT DISTINCT sg.doc_id FROM sg JOIN evg ON sg.g = evg.g),
         |rel AS (SELECT * FROM s WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
         |k AS (
         |  SELECT doc_id, lang, toks,
         |    (greatest(n_tokens - 10, 1) + 39) div 40 AS n_chunks
         |  FROM rel),
         |c AS (
         |  SELECT doc_id, lang,
         |    size(slice(toks, CAST(chunk_idx * 40 + 1 AS INT), 50)) AS chunk_len
         |  FROM (SELECT doc_id, lang, toks,
         |          explode(sequence(0, n_chunks - 1)) AS chunk_idx FROM k))
         |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
         |  SUM(CAST(chunk_len AS BIGINT)) AS chunk_tokens
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** Histogram-quantile sketch ([[Sketches.histState]]/
    * [[Sketches.histQuantiles]]): p50/p90/p99 of lineitem extended
    * price per return flag from a mergeable equi-width histogram
    * (width 1000) — the quantile member of the sketch family. Exact
    * quantiles need a full sort per group (q31's shape); the sketch is
    * one map-side-combined aggregation with range-bounded state, and
    * its integer-rank lower-boundary estimates are replayed exactly by
    * the oracle (error bound = one bucket width, spec-checked against
    * the true percentile).
    */
  def histQuantilePrices(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice"))
    val st = Sketches.histState(li, "l_extendedprice", width = 1000.0,
      groupCols = Seq("l_returnflag"))
    Sketches.histQuantiles(st, qs = Seq(0.5, 0.9, 0.99),
        groupCols = Seq("l_returnflag"))
      .orderBy("l_returnflag")
  }

  val histQuantilePricesSql: String =
    """WITH st AS (
      |  SELECT l_returnflag,
      |    CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS bucket,
      |    COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, bucket, cnt,
      |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket
      |                   ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
      |  FROM st)
      |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MIN(CASE WHEN cum >= ceil(n * 0.5) THEN bucket END) * 1000.0 AS DOUBLE) AS p50,
      |  CAST(MIN(CASE WHEN cum >= ceil(n * 0.9) THEN bucket END) * 1000.0 AS DOUBLE) AS p90,
      |  CAST(MIN(CASE WHEN cum >= ceil(n * 0.99) THEN bucket END) * 1000.0 AS DOUBLE) AS p99
      |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q232: data-adaptive MERGEABLE quantile sketch
    * ([[Sketches.quantState]], cap 256) over cent-scaled order total
    * per order priority — the rank-error-bounded estimator q71's
    * fixed-boundary histogram can't be when the value range is unknown
    * a priori. Deterministic geometric subsampling by the portable md5
    * hash (KLL's compaction schedule with content-addressed "coin
    * flips"), so the DuckDB oracle replays the ENTIRE sketch: every
    * row's survivable level, the per-group level choice, the kept set,
    * and the integer ppm argmin readout, digit for digit.
    */
  def quantSketchPrices(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders").select(
      col("o_orderpriority"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderkey").as("rid")) // the table's true unique key
    val st = Sketches.quantState(ord, "cents", "rid",
      groupCols = Seq("o_orderpriority"), cap = 256, salt = "quant")
    Sketches.quantQuantiles(st,
        qPpms = Seq(250000L, 500000L, 900000L, 990000L))
      .orderBy("o_orderpriority", "q_ppm")
  }

  /** Shared DuckDB replay of [[Sketches.quantState]] +
    * [[Sketches.quantQuantiles]] over cent-scaled `o_totalprice` keyed
    * by `o_orderkey`: the single-shot build over ALL of `orders`. The
    * merge path (q235) uses the SAME replay — merge ≡ build is a
    * PROVEN identity of the sketch (state is a pure function of the
    * data multiset; SketchesSpec asserts state equality), so one
    * oracle text serves both registrations honestly.
    */
  private[graft] def quantReplaySql(
      groupExpr: String, outName: String, cap: Int, salt: String,
      qPpms: Seq[Long]): String = {
    val key = "CAST(o_orderkey AS VARCHAR)"
    val qsList = qPpms.sorted.mkString(", ")
    s"""WITH raw AS (SELECT $groupExpr AS g,
       |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v,
       |    ${duckHash60(salt, key)} AS h
       |  FROM orders),
       |lm AS (SELECT g, v, h,
       |    CAST(60 - length(bin(h)) AS INT) AS lmax FROM raw),
       |counts AS (SELECT g, lmax, COUNT(*) AS c FROM lm GROUP BY 1, 2),
       |cum AS (SELECT g, lmax,
       |    SUM(c) OVER (PARTITION BY g ORDER BY lmax DESC
       |                 ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM counts),
       |lvl AS (SELECT g, CAST(COALESCE(
       |      MAX(CASE WHEN cum > $cap THEN lmax + 1 END), 0) AS INT)
       |    AS level FROM cum GROUP BY g),
       |meta AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM raw GROUP BY g),
       |kept AS (SELECT lm.g, lm.v, lvl.level,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY lm.g
       |      ORDER BY lm.v ASC, lm.h ASC) AS BIGINT) - 1 AS i
       |  FROM lm JOIN lvl ON lvl.g = lm.g WHERE lm.lmax >= lvl.level),
       |qs AS (SELECT CAST(unnest([$qsList]) AS BIGINT) AS q_ppm),
       |cand AS (SELECT k.g, q.q_ppm, m.n, k.level, k.v,
       |    k.i * (1::BIGINT << k.level) AS est_rank,
       |    abs(k.i * (1::BIGINT << k.level) * 1000000
       |        - q.q_ppm * (m.n - 1)) AS cost
       |  FROM kept k CROSS JOIN qs q JOIN meta m ON m.g = k.g),
       |pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g, q_ppm
       |    ORDER BY cost ASC, est_rank ASC) AS r FROM cand)
       |SELECT g AS $outName, q_ppm, n, level, v AS value,
       |  est_rank
       |FROM pick WHERE r = 1 ORDER BY 1, 2""".stripMargin
  }

  val quantSketchPricesSql: String = quantReplaySql(
    "o_orderpriority", "o_orderpriority", 256, "quant",
    Seq(250000L, 500000L, 900000L, 990000L))

  /** q235: the quantile sketch's MERGE path in the oracled surface —
    * the q77 rollup argument applied to quantiles: three year-sliced
    * states ([[Sketches.quantState]] per slice, disjoint by
    * construction) folded with [[Sketches.QuantState.merge]], read out
    * once. The oracle is deliberately the SINGLE-SHOT replay over all
    * of `orders` ([[quantReplaySql]]): merge(A,B,C) ≡ build(A∪B∪C) is
    * the sketch's structural identity (content-addressed membership is
    * a pure function of the row), so a hash match here certifies the
    * distributed merge path end-to-end on real data — states from any
    * ingest cadence answer as if built in one pass, without rescanning
    * history.
    */
  def quantSketchMerge(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders").select(
      col("o_orderstatus"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderkey").as("rid"),
      (year(col("o_orderdate")) % 3).cast("int").as("__slice"))
    val states = (0 until 3).map(i =>
      Sketches.quantState(ord.where(col("__slice") === i),
        "cents", "rid", groupCols = Seq("o_orderstatus"),
        cap = 128, salt = "quantm"))
    val merged = states.reduce(_ merge _)
    Sketches.quantQuantiles(merged,
        qPpms = Seq(100000L, 500000L, 990000L))
      .orderBy("o_orderstatus", "q_ppm")
  }

  val quantSketchMergeSql: String = quantReplaySql(
    "o_orderstatus", "o_orderstatus", 128, "quantm",
    Seq(100000L, 500000L, 990000L))

  /** Exact distributed regression ([[Stats.regression]]): slope /
    * intercept / Pearson r of extended price on quantity per return
    * flag, from DECIMAL-exact power sums — deterministic under any
    * partitioning (Spark's built-in corr/covar are running-double
    * aggregates whose last ulp depends on aggregation order, which is
    * why they cannot be hash-oracled and this can).
    */
  def regressionPriceQty(s: SparkSession, dir: String): DataFrame =
    Stats.regression(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")),
        Seq("l_returnflag"), "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag")

  // DuckDB needs precision >= 19 to store these products in HUGEINT
  // (int64-backed DECIMAL(<=18) overflows on price*price); Spark keeps
  // (14,4) — both sides are exact rationals, so the doubles they cast
  // to are identical, which is all the hash compares
  val regressionPriceQtySql: String =
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy,
      |    SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy,
      |    (MIN(CAST(l_quantity AS DECIMAL(19,4))) <> MAX(CAST(l_quantity AS DECIMAL(19,4)))) AS x_varies,
      |    (MIN(CAST(l_extendedprice AS DECIMAL(19,4))) <> MAX(CAST(l_extendedprice AS DECIMAL(19,4)))) AS y_varies
      |  FROM lineitem GROUP BY 1),
      |d AS (
      |  SELECT l_returnflag, n, x_varies, y_varies,
      |    CAST(n AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy,
      |    CAST(sxx AS DOUBLE) AS dsxx, CAST(sxy AS DOUBLE) AS dsxy, CAST(syy AS DOUBLE) AS dsyy
      |  FROM s)
      |SELECT l_returnflag, n,
      |  CASE WHEN x_varies THEN
      |    floor((dn * dsxy - dsx * dsy) / (dn * dsxx - dsx * dsx) * 1e6) / 1e6 END AS slope,
      |  CASE WHEN x_varies THEN
      |    floor((dsy - ((dn * dsxy - dsx * dsy) / (dn * dsxx - dsx * dsx)) * dsx) / dn * 1e6) / 1e6 END AS intercept,
      |  CASE WHEN x_varies AND y_varies THEN
      |    floor((dn * dsxy - dsx * dsy) /
      |          sqrt((dn * dsxx - dsx * dsx) * (dn * dsyy - dsy * dsy)) * 1e6) / 1e6 END AS r
      |FROM d ORDER BY l_returnflag""".stripMargin

  /** Interval-OVERLAP self-join ([[IntervalJoin.selfOverlapPairs]]):
    * pairs of bulk lineitems (quantity >= 40) of the same supplier
    * whose transit windows [ship_day, ship_day + quantity days] share
    * at least one day — aggregated per supplier so any pair the
    * bucketed join misses or double-counts shifts the hash. Oracle:
    * the literal all-pairs overlap join (the bucket decomposition is
    * an exact rewrite, so all-pairs is the ground truth, not an
    * approximation).
    */
  def intervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
    val iv = t(s, dir, "lineitem")
      .where(col("l_quantity") >= 40)
      .select(col("l_suppkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("item_id"),
        day.as("ship_day"),
        (day + col("l_quantity").cast("int")).as("arrive_day"))
    IntervalJoin.selfOverlapPairs(
        iv, "l_suppkey", "item_id", "ship_day", "arrive_day", bucketSize = 64)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_pairs"), sum(col("overlap")).as("overlap_days"))
      .orderBy("l_suppkey")
  }

  val intervalOverlapSql: String =
    """WITH iv AS (
      |  SELECT l_suppkey, l_orderkey * 10 + l_linenumber AS item_id,
      |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s,
      |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |      + CAST(l_quantity AS INT) AS e
      |  FROM lineitem WHERE l_quantity >= 40)
      |SELECT a.l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s) + 1) AS BIGINT) AS overlap_days
      |FROM iv a JOIN iv b ON a.l_suppkey = b.l_suppkey AND a.item_id < b.item_id
      |  AND a.s <= b.e AND b.s <= a.e
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Leakage-proof train/val/test assignment
    * ([[Sampling.leakProofSplit]]): split by duplicate-GROUP
    * representative so near-copies never straddle train and test.
    * Oracle: the q35 recursive-CTE component labels + the q69 md5
    * bucket replay, composed.
    */
  def leakproofSplit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Sampling.leakProofSplit(d, "doc_id",
        Dedup.minhashLSH(d, "doc_id", "text", threshold = 0.7),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col("doc_id"), col("rep_id"), col("split"))
      .orderBy("doc_id")
  }

  val leakproofSplitSql: String = {
    val b = s"${duckHash60("split", "rep_id")} % 100"
    s"""$componentLabelsSqlPrefix,
       |r AS (
       |  SELECT d.doc_id, coalesce(l.group_id, d.doc_id) AS rep_id
       |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
       |SELECT doc_id, rep_id,
       |  CASE WHEN $b < 80 THEN 'train'
       |       WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Per-group z-score outliers ([[Stats.outliers]]) over event values:
    * |value − mean| > 3σ within the event type, z computed scale-free
    * from the q72 DECIMAL power sums so both engines run the identical
    * IEEE sequence. Oracle replays sums, filter, and truncation.
    */
  def groupOutliers(s: SparkSession, dir: String): DataFrame =
    Stats.outliers(
        t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"), "value", k = 3.0)
      .orderBy("event_id")

  val groupOutliersSql: String =
    """WITH s AS (
      |  SELECT event_type,
      |    COUNT(CAST(value AS DECIMAL(19,4))) AS n,
      |    SUM(CAST(value AS DECIMAL(19,4))) AS sx,
      |    SUM(CAST(value AS DECIMAL(19,4)) * CAST(value AS DECIMAL(19,4))) AS sxx,
      |    (MIN(CAST(value AS DECIMAL(19,4))) <> MAX(CAST(value AS DECIMAL(19,4)))) AS varies
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT event_type, varies, CAST(n AS DOUBLE) AS dn,
      |    CAST(sx AS DOUBLE) AS dsx, CAST(sxx AS DOUBLE) AS dsxx
      |  FROM s)
      |SELECT events.event_type, event_id, value,
      |  floor((dn * CAST(CAST(value AS DECIMAL(19,4)) AS DOUBLE) - dsx)
      |        / sqrt(dn * dsxx - dsx * dsx) * 1e6) / 1e6 AS z
      |FROM events JOIN d
      |  ON events.event_type IS NOT DISTINCT FROM d.event_type
      |WHERE varies AND dn * dsxx - dsx * dsx > 0
      |  AND abs((dn * CAST(CAST(value AS DECIMAL(19,4)) AS DOUBLE) - dsx)
      |          / sqrt(dn * dsxx - dsx * dsx)) > 3.0
      |ORDER BY event_id""".stripMargin

  /** Top-k per group WITHOUT a window sort ([[TopKAgg]]): the native
    * bounded-buffer aggregate ships k pairs per group through the
    * shuffle where `row_number() OVER (...)` ships every row into a
    * per-group sort. Oracle: exactly that window, replayed in DuckDB —
    * same (value DESC, id ASC) order, so agreement proves the
    * aggregation tree discards precisely the rows the sort would.
    */
  def topkPrices(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(TopKAgg.topK(col("o_totalprice"), col("o_orderkey"), 5).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rnk"),
        col("p.val").as("price"), col("p.id").as("o_orderkey"))
      .orderBy("o_orderpriority", "rnk")

  val topkPricesSql: String =
    """SELECT o_orderpriority, rnk, price, o_orderkey FROM (
      |  SELECT o_orderpriority,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
      |    o_totalprice AS price, o_orderkey
      |  FROM orders)
      |WHERE rnk <= 5 ORDER BY o_orderpriority, rnk""".stripMargin

  /** Two-level HLL rollup ([[Sketches.hllMerge]]): per-(type, day)
    * states merged down to per-type, estimated, and compared against
    * the direct single-pass state — `merge_exact` is TRUE because
    * register max is associative, which is the whole point of keeping
    * daily sketches at 100 TB (arbitrary-range distincts with no
    * rescan). The oracle replays the LONG route (daily → merge →
    * estimate), so both engines prove the rollup path end-to-end.
    */
  def hllRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"), col("user_id"),
      expr("ts div 86400000000000").as("day"))
    val daily = Sketches.hllState(ev, "user_id", Seq("event_type", "day"))
    val merged = Sketches.hllRawEstimate(
      Sketches.hllMerge(daily, Seq("event_type")), Seq("event_type"))
    val direct = Sketches.hllRawEstimate(
        Sketches.hllState(ev, "user_id", Seq("event_type")), Seq("event_type"))
      .select(col("event_type"), col("raw_est").as("direct_est"))
    val exact = ev.groupBy("event_type").agg(
      countDistinct(col("day")).as("n_days"),
      countDistinct(col("user_id")).as("exact_users"))
    exact.join(merged, Seq("event_type")).join(direct, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("exact_users"),
        col("buckets_hit"),
        (floor(col("raw_est") * 1e4) / 1e4).as("hll_raw_est"),
        (col("raw_est") === col("direct_est")).as("merge_exact"))
      .orderBy("event_type")
  }

  val hllRollupSql: String = {
    val h = duckHash60("", "user_id")
    s"""WITH b AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
       |    $h % 64 AS bucket,
       |    ${duckHllRho(h)} AS rho
       |  FROM events),
       |daily AS (
       |  SELECT event_type, day, bucket, MAX(rho) AS max_rho
       |  FROM b GROUP BY 1, 2, 3),
       |merged AS (
       |  SELECT event_type, bucket, MAX(max_rho) AS max_rho
       |  FROM daily GROUP BY 1, 2),
       |e AS (
       |  SELECT event_type, CAST(COUNT(*) AS INT) AS buckets_hit,
       |    $duckHllEstimate AS raw_est
       |  FROM merged GROUP BY 1),
       |direct AS (
       |  SELECT event_type,
       |    $duckHllEstimate AS direct_est
       |  FROM (SELECT event_type, bucket, MAX(rho) AS max_rho
       |        FROM b GROUP BY 1, 2) GROUP BY 1),
       |x AS (
       |  SELECT event_type, COUNT(DISTINCT epoch_ns(ts) // 86400000000000) AS n_days,
       |    COUNT(DISTINCT user_id) AS exact_users
       |  FROM events GROUP BY 1)
       |SELECT x.event_type, x.n_days, x.exact_users, e.buckets_hit,
       |  floor(e.raw_est * 1e4) / 1e4 AS hll_raw_est,
       |  e.raw_est = direct.direct_est AS merge_exact
       |FROM x JOIN e USING (event_type) JOIN direct USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  /** ROBUST (median/MAD) per-group outliers ([[Stats.robustOutliers]]):
    * the heavy-tail-safe twin of q75 — the 3σ mean/stddev detector's
    * own statistics are dragged by the extremes it hunts; the median
    * and MAD are not. Both median stages run on exact integers (2
    * fixed decimals × 100, deviations doubled), so the interpolated
    * percentile is exact rational arithmetic in both engines and the
    * flag set hash-matches.
    */
  def robustOutliersEvents(s: SparkSession, dir: String): DataFrame =
    Stats.robustOutliers(
        t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"), "value", k = 3.0, decimals = 2)
      .orderBy("event_id")

  val robustOutliersEventsSql: String =
    """WITH sv AS (
      |  SELECT event_id, event_type, value,
      |    CAST(CAST(value AS DECIMAL(19,4)) * 100 AS BIGINT) AS sv
      |  FROM events),
      |med AS (
      |  SELECT event_type, quantile_cont(sv, 0.5) * 2 AS med2
      |  FROM sv GROUP BY 1),
      |dev AS (
      |  SELECT sv.event_id, sv.event_type, sv.value,
      |    abs(sv.sv * 2 - med.med2) AS d2
      |  FROM sv JOIN med ON sv.event_type IS NOT DISTINCT FROM med.event_type),
      |mad AS (
      |  SELECT event_type, quantile_cont(d2, 0.5) * 2 AS mad4
      |  FROM dev GROUP BY 1)
      |SELECT dev.event_type, event_id, value,
      |  floor((d2 / 2.0 / 100) / (1.4826 * (mad4 / 4.0) / 100) * 1e6) / 1e6 AS robust_z
      |FROM dev JOIN mad ON dev.event_type IS NOT DISTINCT FROM mad.event_type
      |WHERE mad4 > 0
      |  AND (d2 / 2.0 / 100) / (1.4826 * (mad4 / 4.0) / 100) > 3.0
      |ORDER BY event_id""".stripMargin

  /** Tolerance-bounded + forward as-of joins ([[AsOfJoin]] with
    * `tolerance` / [[AsOfJoin.nextAsOf]]): each click's last view
    * within the preceding 5 minutes AND its next view within the
    * following 5 minutes — pandas merge_asof's tolerance/direction
    * surface. All comparisons run on the micros-truncated timeline on
    * BOTH engines (ordering by raw nanos would tie-break differently).
    */
  def asofTolerance(s: SparkSession, dir: String): DataFrame = {
    val tolMicros = 300000000L // 5 min
    val ev = t(s, dir, "events").withColumn("ts", expr("ts div 1000"))
    val clicks = ev.where(col("event_type") === "click")
    val views = ev.where(col("event_type") === "view")
    val back = AsOfJoin.latestAsOf(clicks, views, "user_id", "ts", "event_id",
        tolerance = tolMicros)
      .select(col("left_id").as("click_id"), col("as_of_id").as("view_before"))
    val fwd = AsOfJoin.nextAsOf(clicks, views, "user_id", "ts", "event_id",
        tolerance = tolMicros)
      .select(col("left_id").as("click_id"), col("as_of_id").as("view_after"))
    back.join(fwd, Seq("click_id")).orderBy("click_id")
  }

  val asofToleranceSql: String =
    """SELECT c.event_id AS click_id,
      |  (SELECT v.event_id FROM events v
      |   WHERE v.user_id = c.user_id AND v.event_type = 'view'
      |     AND epoch_ns(v.ts) // 1000 <= epoch_ns(c.ts) // 1000
      |     AND epoch_ns(c.ts) // 1000 - epoch_ns(v.ts) // 1000 <= 300000000
      |   ORDER BY epoch_ns(v.ts) // 1000 DESC, v.event_id DESC LIMIT 1) AS view_before,
      |  (SELECT v.event_id FROM events v
      |   WHERE v.user_id = c.user_id AND v.event_type = 'view'
      |     AND epoch_ns(v.ts) // 1000 >= epoch_ns(c.ts) // 1000
      |     AND epoch_ns(v.ts) // 1000 - epoch_ns(c.ts) // 1000 <= 300000000
      |   ORDER BY epoch_ns(v.ts) // 1000 ASC, v.event_id ASC LIMIT 1) AS view_after
      |FROM events c WHERE c.event_type = 'click' ORDER BY click_id""".stripMargin

  /** q88: the STRICT-inequality as-of pair (pandas merge_asof
    * `allow_exact_matches=False`) — the contract trade joins hit
    * immediately (a quote AT the trade's own timestamp must not match
    * itself). Same union+window plan as q79; strictness is purely the
    * equal-ts sort order. Oracle: q79's correlated-subquery replay with
    * `<`/`>` in place of `<=`/`>=`.
    */
  def asofStrict(s: SparkSession, dir: String): DataFrame = {
    val tolMicros = 300000000L // 5 min
    val ev = t(s, dir, "events").withColumn("ts", expr("ts div 1000"))
    val clicks = ev.where(col("event_type") === "click")
    val views = ev.where(col("event_type") === "view")
    val back = AsOfJoin.latestAsOf(clicks, views, "user_id", "ts", "event_id",
        tolerance = tolMicros, allowExactMatches = false)
      .select(col("left_id").as("click_id"), col("as_of_id").as("view_before"))
    val fwd = AsOfJoin.nextAsOf(clicks, views, "user_id", "ts", "event_id",
        tolerance = tolMicros, allowExactMatches = false)
      .select(col("left_id").as("click_id"), col("as_of_id").as("view_after"))
    back.join(fwd, Seq("click_id")).orderBy("click_id")
  }

  val asofStrictSql: String =
    """SELECT c.event_id AS click_id,
      |  (SELECT v.event_id FROM events v
      |   WHERE v.user_id = c.user_id AND v.event_type = 'view'
      |     AND epoch_ns(v.ts) // 1000 < epoch_ns(c.ts) // 1000
      |     AND epoch_ns(c.ts) // 1000 - epoch_ns(v.ts) // 1000 <= 300000000
      |   ORDER BY epoch_ns(v.ts) // 1000 DESC, v.event_id DESC LIMIT 1) AS view_before,
      |  (SELECT v.event_id FROM events v
      |   WHERE v.user_id = c.user_id AND v.event_type = 'view'
      |     AND epoch_ns(v.ts) // 1000 > epoch_ns(c.ts) // 1000
      |     AND epoch_ns(v.ts) // 1000 - epoch_ns(c.ts) // 1000 <= 300000000
      |   ORDER BY epoch_ns(v.ts) // 1000 ASC, v.event_id ASC LIMIT 1) AS view_after
      |FROM events c WHERE c.event_type = 'click' ORDER BY click_id""".stripMargin

  /** q89: direction='nearest' (pandas tie rule: backward wins an exact
    * distance tie) — unbounded inclusive in one column, strict with a
    * 5-minute tolerance in the other, so the tie rule, both tolerance
    * filters, and the strict sort all sit under the hash. Oracle: one
    * correlated subquery per column ordered by (|Δt|, side, id-within-
    * side) — the literal nearest definition.
    */
  def asofNearest(s: SparkSession, dir: String): DataFrame = {
    val tolMicros = 300000000L // 5 min
    val ev = t(s, dir, "events").withColumn("ts", expr("ts div 1000"))
    val clicks = ev.where(col("event_type") === "click")
    val views = ev.where(col("event_type") === "view")
    val near = AsOfJoin.nearestAsOf(clicks, views, "user_id", "ts", "event_id")
      .select(col("left_id").as("click_id"), col("as_of_id").as("nearest_view"))
    val nearStrict = AsOfJoin.nearestAsOf(clicks, views, "user_id", "ts",
        "event_id", tolerance = tolMicros, allowExactMatches = false)
      .select(col("left_id").as("click_id"),
        col("as_of_id").as("nearest_view_strict"))
    near.join(nearStrict, Seq("click_id")).orderBy("click_id")
  }

  val asofNearestSql: String =
    """SELECT c.event_id AS click_id,
      |  (SELECT v.event_id FROM events v
      |   WHERE v.user_id = c.user_id AND v.event_type = 'view'
      |   ORDER BY abs(epoch_ns(v.ts) // 1000 - epoch_ns(c.ts) // 1000) ASC,
      |     (CASE WHEN epoch_ns(v.ts) // 1000 <= epoch_ns(c.ts) // 1000
      |           THEN 0 ELSE 1 END) ASC,
      |     (CASE WHEN epoch_ns(v.ts) // 1000 <= epoch_ns(c.ts) // 1000
      |           THEN -v.event_id ELSE v.event_id END) ASC
      |   LIMIT 1) AS nearest_view,
      |  (SELECT v.event_id FROM events v
      |   WHERE v.user_id = c.user_id AND v.event_type = 'view'
      |     AND epoch_ns(v.ts) // 1000 <> epoch_ns(c.ts) // 1000
      |     AND abs(epoch_ns(v.ts) // 1000 - epoch_ns(c.ts) // 1000) <= 300000000
      |   ORDER BY abs(epoch_ns(v.ts) // 1000 - epoch_ns(c.ts) // 1000) ASC,
      |     (CASE WHEN epoch_ns(v.ts) // 1000 < epoch_ns(c.ts) // 1000
      |           THEN 0 ELSE 1 END) ASC,
      |     (CASE WHEN epoch_ns(v.ts) // 1000 < epoch_ns(c.ts) // 1000
      |           THEN -v.event_id ELSE v.event_id END) ASC
      |   LIMIT 1) AS nearest_view_strict
      |FROM events c WHERE c.event_type = 'click' ORDER BY click_id""".stripMargin

  /** Two-table interval join ([[IntervalJoin.overlapJoin]]): lineitem
    * transit windows × the parent order's opening week, keyed by order
    * — "which shipments were in flight while the order was fresh",
    * aggregated per order priority. Oracle: the literal two-table
    * all-pairs overlap join.
    */
  def intervalJoinOrders(s: SparkSession, dir: String): DataFrame = {
    val shipDay = datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
    val transit = t(s, dir, "lineitem")
      .where(col("l_quantity") >= 30)
      .select(col("l_orderkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("item_id"),
        shipDay.as("s_day"),
        (shipDay + col("l_quantity").cast("int")).as("e_day"))
    val orderDay = datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
    val orders = t(s, dir, "orders")
    val opening = orders.select(col("o_orderkey").as("l_orderkey"),
      col("o_orderkey").as("item_id"),
      orderDay.as("s_day"), (orderDay + 6).as("e_day"))
    val prio = orders.select(col("o_orderkey").as("l_orderkey"),
      col("o_orderpriority"))
    IntervalJoin.overlapJoin(transit, opening,
        "l_orderkey", "item_id", "s_day", "e_day", bucketSize = 64)
      .join(prio, Seq("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("overlap")).as("overlap_days"))
      .orderBy("o_orderpriority")
  }

  val intervalJoinOrdersSql: String =
    """WITH tr AS (
      |  SELECT l_orderkey,
      |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s,
      |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |      + CAST(l_quantity AS INT) AS e
      |  FROM lineitem WHERE l_quantity >= 30),
      |op AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 6 AS e
      |  FROM orders)
      |SELECT op.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(least(tr.e, op.e) - greatest(tr.s, op.s) + 1) AS BIGINT) AS overlap_days
      |FROM tr JOIN op ON tr.l_orderkey = op.o_orderkey
      |  AND tr.s <= op.e AND op.s <= tr.e
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Cluster-quality metric on the reference's own domain: simplified
    * (centroid) SILHOUETTE per cluster for the q12 fixed-centers
    * assignment — s = (b − a)/b with a = distance to the assigned
    * center, b = distance to the runner-up (b ≥ a, so max(a,b) = b).
    * Hamming distances over 4 attributes are ints in [0,4] and every
    * pairwise-distinct center forces b ≥ 1, so 12·s = 12 − 12a/b is an
    * EXACT integer (b | 12); the per-cluster mean is one exact integer
    * sum divided once — bit-identical in both engines.
    */
  def silhouetteFixed(s: SparkSession, dir: String): DataFrame = {
    val cLit = typedlit(FixedCenters.map(_.toSeq).toSeq)
    def trunc6(c: Column) = Stats.trunc6(c)
    t(s, dir, "orders")
      .select(Distances.hammingToCenters(orderFeatures, cLit).as("ds"))
      .select(Distances.argminIndex(col("ds")).as("prediction"),
        array_min(col("ds")).as("a"),
        (aggregate(col("ds"), lit(0), (acc, x) => acc + x)
          - array_min(col("ds")) - array_max(col("ds"))).as("b"))
      .select(col("prediction"), expr("12 - (12 * a) div b").as("sil12"))
      .groupBy("prediction")
      .agg(count(lit(1)).as("n"), sum(col("sil12")).as("__s12"))
      .select(col("prediction"), col("n"),
        trunc6(col("__s12").cast("double") / (lit(12.0) * col("n").cast("double")))
          .as("avg_sil"))
      .orderBy("prediction")
  }

  val silhouetteFixedSql: String =
    s"""WITH d AS ($fixedCenterDistSql),
       |s AS (
       |  SELECT
       |    CASE WHEN d0 <= d1 AND d0 <= d2 THEN 0
       |         WHEN d1 <= d2 THEN 1 ELSE 2 END AS prediction,
       |    least(d0, d1, d2) AS a,
       |    d0 + d1 + d2 - least(d0, d1, d2) - greatest(d0, d1, d2) AS b
       |  FROM d)
       |SELECT prediction, COUNT(*) AS n,
       |  floor(CAST(SUM(12 - (12 * a) // b) AS DOUBLE)
       |        / (12.0 * CAST(COUNT(*) AS DOUBLE)) * 1e6) / 1e6 AS avg_sil
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-group normalization ([[Stats.normalize]]): every event gains
    * a z-score and a min-max scaling within its type — the feature-prep
    * op every training pipeline runs before numeric columns feed a
    * model. Same q75 exact-moment machinery, no flag filter, so the
    * whole-row output (not just the extremes) is hash-verified.
    */
  def normalizeEvents(s: SparkSession, dir: String): DataFrame =
    Stats.normalize(
        t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"), "value")
      .orderBy("event_id")

  val normalizeEventsSql: String =
    """WITH s AS (
      |  SELECT event_type,
      |    COUNT(CAST(value AS DECIMAL(19,4))) AS n,
      |    SUM(CAST(value AS DECIMAL(19,4))) AS sx,
      |    SUM(CAST(value AS DECIMAL(19,4)) * CAST(value AS DECIMAL(19,4))) AS sxx,
      |    MIN(CAST(value AS DECIMAL(19,4))) AS mn,
      |    MAX(CAST(value AS DECIMAL(19,4))) AS mx
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT event_type, (mn <> mx) AS varies,
      |    CAST(n AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
      |    CAST(sxx AS DOUBLE) AS dsxx,
      |    CAST(mn AS DOUBLE) AS dmn, CAST(mx AS DOUBLE) AS dmx
      |  FROM s)
      |SELECT events.event_type, event_id, value,
      |  CASE WHEN varies AND dn * dsxx - dsx * dsx > 0 THEN
      |    floor((dn * CAST(CAST(value AS DECIMAL(19,4)) AS DOUBLE) - dsx)
      |          / sqrt(dn * dsxx - dsx * dsx) * 1e6) / 1e6 END AS z,
      |  CASE WHEN varies THEN
      |    floor((CAST(CAST(value AS DECIMAL(19,4)) AS DOUBLE) - dmn)
      |          / (dmx - dmn) * 1e6) / 1e6 END AS minmax
      |FROM events JOIN d
      |  ON events.event_type IS NOT DISTINCT FROM d.event_type
      |ORDER BY event_id""".stripMargin
}
