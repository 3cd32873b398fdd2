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
private[graft] trait QueriesRegressionBehavior { this: Queries.type =>
  /** q197: two-feature regression ([[Stats.regression2]]) — extended
    * price on (quantity, discount) per return flag: the workhorse
    * multiple-OLS fit from DECIMAL-exact power sums, Cramer's-rule
    * closed form replayed by the oracle as the identical IEEE double
    * sequence (the q72 recipe, one regressor wider).
    */
  def regression2Lineitem(s: SparkSession, dir: String): DataFrame =
    Stats.regression2(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_quantity"), col("l_discount"), col("l_extendedprice")),
        Seq("l_returnflag"), "l_quantity", "l_discount", "l_extendedprice")
      .orderBy("l_returnflag")

  val regression2LineitemSql: String =
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4))) AS s1,
      |    SUM(CAST(l_discount AS DECIMAL(19,4))) AS s2,
      |    SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4))
      |      * CAST(l_quantity AS DECIMAL(19,4))) AS s11,
      |    SUM(CAST(l_discount AS DECIMAL(19,4))
      |      * CAST(l_discount AS DECIMAL(19,4))) AS s22,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4))
      |      * CAST(l_discount AS DECIMAL(19,4))) AS s12,
      |    SUM(CAST(l_quantity AS DECIMAL(19,4))
      |      * CAST(l_extendedprice AS DECIMAL(19,4))) AS s1y,
      |    SUM(CAST(l_discount AS DECIMAL(19,4))
      |      * CAST(l_extendedprice AS DECIMAL(19,4))) AS s2y,
      |    SUM(CAST(l_extendedprice AS DECIMAL(19,4))
      |      * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy,
      |    (MIN(l_quantity) <> MAX(l_quantity)) AS v1,
      |    (MIN(l_discount) <> MAX(l_discount)) AS v2,
      |    (MIN(l_extendedprice) <> MAX(l_extendedprice)) AS vy
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
      |    AND l_extendedprice IS NOT NULL
      |  GROUP BY 1),
      |d AS (SELECT l_returnflag, n, v1, v2, vy,
      |    CAST(n AS DOUBLE) AS dn,
      |    CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
      |    CAST(sy AS DOUBLE) AS dy,
      |    CAST(s11 AS DOUBLE) AS d11, CAST(s22 AS DOUBLE) AS d22,
      |    CAST(s12 AS DOUBLE) AS d12,
      |    CAST(s1y AS DOUBLE) AS d1y, CAST(s2y AS DOUBLE) AS d2y,
      |    CAST(syy AS DOUBLE) AS dyy
      |  FROM s),
      |m AS (SELECT l_returnflag, n, v1, v2, vy, dn, d1, d2, dy,
      |    dn * d11 - d1 * d1 AS a11,
      |    dn * d12 - d1 * d2 AS a12,
      |    dn * d22 - d2 * d2 AS a22,
      |    dn * d1y - d1 * dy AS b1n,
      |    dn * d2y - d2 * dy AS b2n,
      |    dn * dyy - dy * dy AS sst
      |  FROM d),
      |f AS (SELECT *, a11 * a22 - a12 * a12 AS det,
      |    (b1n * a22 - b2n * a12) / (a11 * a22 - a12 * a12) AS b1,
      |    (b2n * a11 - b1n * a12) / (a11 * a22 - a12 * a12) AS b2
      |  FROM m)
      |SELECT l_returnflag, n,
      |  CASE WHEN v1 AND v2 AND det > 0 THEN
      |    floor((dy - b1 * d1 - b2 * d2) / dn * 1e6) / 1e6 END AS b0,
      |  CASE WHEN v1 AND v2 AND det > 0 THEN
      |    floor(b1 * 1e6) / 1e6 END AS b1,
      |  CASE WHEN v1 AND v2 AND det > 0 THEN
      |    floor(b2 * 1e6) / 1e6 END AS b2,
      |  CASE WHEN v1 AND v2 AND det > 0 AND vy AND sst > 0 THEN
      |    floor((b1 * b1n + b2 * b2n) / sst * 1e6) / 1e6 END AS r2
      |FROM f ORDER BY l_returnflag""".stripMargin

  /** q198: arrival-health report ([[Quality.arrivalHealth]]) over the
    * events log — per event type, duplicate ids and event-time
    * regressions against each user's earlier arrivals (arrival order =
    * event_id), exact counts + floor-ppm rate: the audit that sizes
    * watermarks and dedup state before a stream goes live.
    */
  def arrivalHealthEvents(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quality.arrivalHealth(t(s, dir, "events"),
        "event_type", "user_id", "event_id", "ts", "event_id")
      .orderBy("event_type")

  val arrivalHealthEventsSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    epoch_ns(ts) AS tns FROM events),
      |w AS (SELECT event_type, event_id, tns,
      |    MAX(tns) OVER (PARTITION BY user_id ORDER BY event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM e)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS n_dup_ids,
      |  CAST(SUM(CASE WHEN pm IS NOT NULL AND tns < pm THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_ooo,
      |  CAST(SUM(CASE WHEN pm IS NOT NULL AND tns < pm THEN 1 ELSE 0 END)
      |    * 1000000 // COUNT(*) AS BIGINT) AS ooo_ppm
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q199: Theil–Sen robust trend ([[Stats.theilSen]]) of daily
    * revenue vs epoch day per return flag — the median pairwise slope
    * that shrugs off outlier days OLS would chase. Aggregate-grain
    * pair scan by contract; the oracle replays every pair slope
    * (signed double-floor e6) and the lower nearest-rank median.
    */
  def theilSenRevenue(s: SparkSession, dir: String): DataFrame = {
    // WEEK grain: the O(n²) pair scan is the statistic's cost — ~360
    // weeks/group keeps it ~65k pairs where day grain would be ~3M
    val weekly = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"),
        expr("datediff(to_date(l_shipdate), DATE '1970-01-01') div 7")
          .as("week"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("rev"))
    Stats.theilSen(weekly, Seq("l_returnflag"), "week", "rev")
      .orderBy("l_returnflag")
  }

  val theilSenRevenueSql: String =
    """WITH d AS (SELECT l_returnflag AS g,
      |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |      // 7 AS x,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (SELECT a.g, a.x AS xa, b.x AS xb,
      |    CAST(FLOOR(CAST(b.y - a.y AS DOUBLE) * 1e6
      |      / CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS s
      |  FROM d a JOIN d b ON a.g = b.g AND a.x < b.x),
      |rk AS (SELECT g, s,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY s ASC, xa ASC,
      |      xb ASC) AS r,
      |    COUNT(*) OVER (PARTITION BY g) AS m
      |  FROM p),
      |med AS (SELECT g, CAST(m AS BIGINT) AS n_pairs,
      |    CAST(s AS BIGINT) AS slope_e6
      |  FROM rk WHERE r = (m + 1) // 2),
      |ns AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY g)
      |SELECT ns.g AS l_returnflag, ns.n, med.n_pairs, med.slope_e6
      |FROM ns JOIN med ON med.g = ns.g ORDER BY 1""".stripMargin

  /** q200: hierarchical (taxonomy) rollup ([[Rollup.hierarchyRollup]])
    * — per-category subtree revenue where category = partkey div 4
    * chains (the synthetic-key taxonomy): each leaf explodes its
    * closed-form ancestor list, one aggregation lands subtree counts
    * and sums; near-root slice (node ≤ 255). No recursion anywhere.
    */
  def hierarchyParts(s: SparkSession, dir: String): DataFrame = {
    val perPart = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("rev"))
    Rollup.hierarchyRollup(perPart, "l_partkey", "rev", fanout = 4)
      .where(col("node") <= 255)
      .orderBy("node")
  }

  val hierarchyPartsSql: String =
    """WITH pp AS (SELECT l_partkey AS id,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |anc AS (SELECT id // CAST(power(4, i.i) AS BIGINT) AS node, rev
      |  FROM pp CROSS JOIN (SELECT unnest(range(0, 16)) AS i) i
      |  WHERE id // CAST(power(4, i.i) AS BIGINT) >= 1)
      |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_leaves,
      |  CAST(SUM(rev) AS BIGINT) AS subtree_sum
      |FROM anc WHERE node <= 255
      |GROUP BY node ORDER BY node""".stripMargin

  /** q201: exact money proration ([[Rollup.prorate]]) — each order's
    * total (cents) distributed across its lineitems by quantity
    * weight, floors' remainder to the first line: Σ alloc = total
    * EXACTLY per order, the invariant float proration breaks. The
    * oracle replays both window passes and the remainder bump.
    */
  def prorateOrders(s: SparkSession, dir: String): DataFrame = {
    // line numbers repeat within an order in this data — aggregate to
    // (order, linenumber) grain first so prorate's orderCol is the
    // unique total order its remainder rule requires
    val l = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("w"))
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      floor(col("o_totalprice") * 100).cast("long").as("total"))
    Rollup.prorate(l.join(o, col("o_orderkey") === col("l_orderkey")),
        "l_orderkey", "l_linenumber", "w", "total")
      .select(col("l_orderkey"), col("l_linenumber"), col("alloc"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val prorateOrdersSql: String =
    """WITH lg AS (SELECT l_orderkey, l_linenumber,
      |    CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |j AS (SELECT l.l_orderkey, l.l_linenumber, l.w,
      |    CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS total
      |  FROM lg l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |ws AS (SELECT *, SUM(w) OVER (PARTITION BY l_orderkey) AS wsum,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber) AS rn
      |  FROM j),
      |base AS (SELECT *, CASE WHEN wsum > 0 THEN (total * w) // wsum
      |    WHEN rn = 1 THEN total ELSE 0 END AS b FROM ws),
      |fin AS (SELECT *, SUM(b) OVER (PARTITION BY l_orderkey) AS alc
      |  FROM base)
      |SELECT l_orderkey, l_linenumber,
      |  CAST(b + CASE WHEN rn = 1 THEN total - alc ELSE 0 END AS BIGINT)
      |    AS alloc
      |FROM fin ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q202: greedy bigram generation ([[TextAnalysis.greedyGenerate]])
    * — per language, the argmax walk of the corpus bigram model (seed =
    * most frequent token, 5 successor steps, ties lexicographic): the
    * model-inspection readout where template pollution and mode
    * collapse become visible as looping boilerplate. The oracle
    * replays seed election, the per-token argmax successor table, and
    * all five unrolled steps.
    */
  def lmGenerate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.greedyGenerate(t(s, dir, "documents"), "lang", "text",
        steps = 5)
      .orderBy("lang", "step")

  val lmGenerateSql: String = {
    val steps = (1 to 5).map { i =>
      s"""s$i AS (SELECT s${i - 1}.lang, CAST($i AS BIGINT) AS step,
         |  nxt.b AS token
         |  FROM s${i - 1} JOIN nxt ON nxt.lang = s${i - 1}.lang
         |  AND nxt.a = s${i - 1}.token)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (SELECT lang, $duckToks AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |uni AS (SELECT lang, unnest(toks) AS t FROM tok),
       |uc AS (SELECT lang, t, COUNT(*) AS c FROM uni GROUP BY 1, 2),
       |seed AS (SELECT lang, t FROM (SELECT lang, t,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY c DESC, t ASC) AS rn FROM uc) WHERE rn = 1),
       |bp AS (SELECT lang, unnest([struct_pack(a := toks[i],
       |    b := toks[i + 1]) for i in range(1, len(toks))]) AS u
       |  FROM tok),
       |bc AS (SELECT lang, u.a AS a, u.b AS b, COUNT(*) AS c
       |  FROM bp GROUP BY 1, 2, 3),
       |nxt AS (SELECT lang, a, b FROM (SELECT lang, a, b,
       |    row_number() OVER (PARTITION BY lang, a
       |      ORDER BY c DESC, b ASC) AS rn FROM bc) WHERE rn = 1),
       |s0 AS (SELECT lang, CAST(0 AS BIGINT) AS step, t AS token
       |  FROM seed),
       |$steps
       |SELECT * FROM s0 UNION ALL SELECT * FROM s1
       |UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
       |UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5
       |ORDER BY lang, step""".stripMargin
  }

  /** q203: nearest-centroid (prototype) classifier evaluation
    * ([[Similarity.prototypeEval]]) — centroids from even-id vectors,
    * confusion matrix over odd-id vectors, everything on e6-quantized
    * integer embeddings so both engines land the identical matrix.
    * The embedding-space quality smoke test.
    */
  def prototypeEvalQuery(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.prototypeEval(
        e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1),
        "vec_id", "label", "embedding")
      .orderBy("label", "predicted")
  }

  val prototypeEvalSql: String =
    """WITH q AS (SELECT vec_id, label, i.i AS pos,
      |    CAST(FLOOR(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000.0)
      |      AS BIGINT) AS qv
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i),
      |c AS (SELECT label AS cl, pos,
      |    CAST(FLOOR(CAST(SUM(qv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
      |      AS BIGINT) AS cv
      |  FROM q WHERE vec_id % 2 = 0 GROUP BY 1, 2),
      |d AS (SELECT q.vec_id, q.label, c.cl,
      |    SUM((q.qv - c.cv) * (q.qv - c.cv)) AS dist
      |  FROM q JOIN c ON c.pos = q.pos WHERE q.vec_id % 2 = 1
      |  GROUP BY 1, 2, 3),
      |p AS (SELECT vec_id, label, cl,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY dist ASC, cl ASC) AS rn FROM d)
      |SELECT label, cl AS predicted, CAST(COUNT(*) AS BIGINT) AS n
      |FROM p WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q204: distributed integer k-means ([[KMeansQ.fit]], k=4, 3 Lloyd
    * passes, md5-seeded init) over e6-quantized embeddings — the
    * numeric clustering flagship, every step exact integers so the
    * oracle replays the ENTIRE algorithm (seed ranking, all three
    * assignment/update rounds, stale-center rule) as unrolled
    * MATERIALIZED CTEs at component grain — the q14 Lloyd-replay
    * technique in the continuous domain. Output: per-cluster size and
    * exact inertia.
    */
  def kmeansEmbeddings(s: SparkSession, dir: String): DataFrame =
    KMeansQ.fit(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, maxIter = 3, seed = 42L)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("dist")).as("inertia"))
      .orderBy("cluster")

  /** The q204/q280 shared numeric-Lloyd replay prelude (`WITH q …
    * c3`): e6-quantized long-format components (optionally
    * slice-filtered — q280 trains on even vec_ids), md5 seed ranking,
    * and three unrolled assign/update iterations ending at the c3
    * centroid relation. Defined once so the fit oracle and the
    * estimator-persistence oracle replay the same algorithm.
    */
  private def kmeansLloydPrelude(baseWhere: String): String = {
    def iter(i: Int) =
      s"""d$i AS MATERIALIZED (SELECT q.id, c.cid,
         |    SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
         |  FROM q JOIN c${i - 1} c ON c.pos = q.pos GROUP BY 1, 2),
         |a$i AS MATERIALIZED (SELECT id, cid FROM (SELECT id, cid,
         |    row_number() OVER (PARTITION BY id ORDER BY d ASC, cid ASC)
         |      AS rn FROM d$i) WHERE rn = 1),
         |u$i AS (SELECT a.cid, q.pos,
         |    CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS nv
         |  FROM a$i a JOIN q ON q.id = a.id GROUP BY 1, 2),
         |c$i AS MATERIALIZED (SELECT c.cid, c.pos,
         |    COALESCE(u.nv, c.cv) AS cv
         |  FROM c${i - 1} c LEFT JOIN u$i u
         |    ON u.cid = c.cid AND u.pos = c.pos)""".stripMargin
    s"""WITH q AS MATERIALIZED (SELECT vec_id AS id, i.i AS pos,
       |    CAST(FLOOR(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000.0)
       |      AS BIGINT) AS qv
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
       |  $baseWhere),
       |ids AS (SELECT DISTINCT id FROM q),
       |sd AS (SELECT id, row_number() OVER (ORDER BY
       |    ${duckHash60("42", "id")} ASC, id ASC) AS r FROM ids),
       |c0 AS MATERIALIZED (SELECT CAST(sd.r - 1 AS BIGINT) AS cid,
       |    q.pos, q.qv AS cv
       |  FROM sd JOIN q ON q.id = sd.id WHERE sd.r <= 4),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}""".stripMargin
  }

  val kmeansEmbeddingsSql: String =
    s"""${kmeansLloydPrelude("")},
       |df AS (SELECT q.id, c.cid, SUM((q.qv - c.cv) * (q.qv - c.cv)) AS d
       |  FROM q JOIN c3 c ON c.pos = q.pos GROUP BY 1, 2),
       |af AS (SELECT id, cid, d FROM (SELECT id, cid, d,
       |    row_number() OVER (PARTITION BY id ORDER BY d ASC, cid ASC)
       |      AS rn FROM df) WHERE rn = 1)
       |SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(d) AS BIGINT) AS inertia
       |FROM af GROUP BY cid ORDER BY cluster""".stripMargin

  /** q280: the [[KMeansQEstimator]] PERSISTENCE + TRANSFORM path (the
    * q278 lifecycle for the embedding-array flagship): fit on the
    * EVEN vec_ids (k = 4, 3 passes, the q204 recipe), save the model,
    * load it back, assign the held-out ODD vec_ids with the loaded
    * model's literal-folded `distArray` expression. Oracle: the q204
    * Lloyd prelude restricted to the training slice, held-out rows
    * assigned against the replayed c3 centers by the same
    * (d ASC, cid ASC) argmin — a persistence bug (reordered centers,
    * lost quantization) breaks the hash.
    */
  def kmeansTransform(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val fitted = new KMeansQEstimator()
      .setK(4).setMaxIter(3).setSeed(42L)
      .setIdCol("vec_id").setEmbCol("embedding")
      .fit(e.where(col("vec_id") % 2 === 0))
    val path = s"${scratchDir("kmeansq_model")}/m"
    fitted.write.overwrite().save(path)
    KMeansQModel.load(path).transform(e.where(col("vec_id") % 2 === 1))
      .groupBy(col("prediction").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n"))
      .orderBy("cluster")
  }

  val kmeansTransformSql: String =
    s"""${kmeansLloydPrelude("WHERE vec_id % 2 = 0")},
       |h AS (SELECT vec_id AS id, i.i AS pos,
       |    CAST(FLOOR(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000.0)
       |      AS BIGINT) AS qv
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
       |  WHERE vec_id % 2 = 1),
       |dh AS (SELECT h.id, c.cid, SUM((h.qv - c.cv) * (h.qv - c.cv)) AS d
       |  FROM h JOIN c3 c ON c.pos = h.pos GROUP BY 1, 2),
       |ah AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d ASC, cid ASC)
       |      AS rn FROM dh) WHERE rn = 1)
       |SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n
       |FROM ah GROUP BY cid ORDER BY cluster""".stripMargin

  /** q205: degree assortativity ([[Graph.assortativity]]) of the q107
    * part co-purchase graph — do popular parts co-occur with popular
    * parts? One floor-e6 Pearson of endpoint degrees over the mirrored
    * edge list, exact decimal sums (projection graphs are classically
    * DISassortative — the sign is the diagnosis).
    */
  def assortativityParts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val small = li.groupBy(col("ok")).agg(count(lit(1)).as("n"))
      .where(col("n") <= 6).select(col("ok"))
    val li2 = li.join(small, Seq("ok"), "leftsemi")
    val pairs = li2.as("x").join(li2.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    Graph.assortativity(pairs)
  }

  val assortativityPartsSql: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |ok6 AS (SELECT ok FROM li GROUP BY ok HAVING COUNT(*) <= 6),
      |li2 AS (SELECT li.* FROM li JOIN ok6 USING (ok)),
      |e AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b FROM li2 x
      |  JOIN li2 y ON x.ok = y.ok AND x.pk < y.pk),
      |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM
      |  (SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      |xy AS (SELECT CAST(du.deg AS HUGEINT) AS x,
      |    CAST(dv.deg AS HUGEINT) AS y
      |  FROM (SELECT a AS u, b AS v FROM e
      |        UNION ALL SELECT b, a FROM e) be
      |  JOIN deg du ON du.id = be.u JOIN deg dv ON dv.id = be.v),
      |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
      |    SUM(x * x) AS sxx, SUM(x * y) AS sxy,
      |    MIN(x) AS mn, MAX(x) AS mx
      |  FROM xy)
      |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
      |  CASE WHEN mn <> mx AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
      |    CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * 1000000.0) AS BIGINT) END AS assort_e6
      |FROM m""".stripMargin

  /** q206: Wilson lower-bound ranking ([[Stats.wilsonLowerBound]]) —
    * parts ranked by the CONFIDENCE-ADJUSTED return rate (z = 1.96,
    * min 20 shipments): the sort key that keeps a 1-of-1 return from
    * outranking 95-of-100. The oracle writes the identical IEEE
    * expression shape, so the floor-e6 scores hash-match.
    */
  def wilsonReturns(s: SparkSession, dir: String): DataFrame = {
    val agg = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("trials"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("returns"))
      .where(col("trials") >= 20)
    agg.withColumn("wilson_e6",
        floor(Stats.wilsonLowerBound(col("returns"), col("trials"))
          * lit(1000000.0)).cast("long"))
      .orderBy(col("wilson_e6").desc, col("l_partkey").asc)
      .limit(25)
  }

  val wilsonReturnsSql: String =
    """WITH a AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS trials,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS returns
      |  FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 20),
      |w AS (SELECT l_partkey, trials, returns,
      |    CAST(FLOOR((
      |      (CAST(returns AS DOUBLE) / CAST(trials AS DOUBLE)
      |        + (1.96 * 1.96) / (2.0 * CAST(trials AS DOUBLE))
      |        - 1.96 * SQRT((CAST(returns AS DOUBLE)
      |              / CAST(trials AS DOUBLE)
      |            * (1.0 - CAST(returns AS DOUBLE)
      |              / CAST(trials AS DOUBLE))
      |            + (1.96 * 1.96) / (4.0 * CAST(trials AS DOUBLE)))
      |          / CAST(trials AS DOUBLE)))
      |      / (1.0 + (1.96 * 1.96) / CAST(trials AS DOUBLE))
      |    ) * 1000000.0) AS BIGINT) AS wilson_e6
      |  FROM a)
      |SELECT l_partkey, trials, returns, wilson_e6 FROM w
      |ORDER BY wilson_e6 DESC, l_partkey ASC LIMIT 25""".stripMargin

  /** q207: clamped running balance ([[Behavior.clampedBalance]]) —
    * per-user wallet fold max(0, b + d) over event deltas
    * (purchase/signup credit, error debit), computed WITHOUT a
    * sequential scan via the Lindley closed form (prefix sum + prefix
    * min). End/peak balances and actual floor events, all exact cents.
    */
  def clampedWallet(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("delta",
        when(col("event_type").isin("purchase", "signup"),
          floor(col("value") * 100).cast("long"))
          .when(col("event_type") === "error",
            -floor(col("value") * 100).cast("long"))
          .otherwise(lit(0L)))
      .where(col("delta") =!= 0)
    Behavior.clampedBalance(e, "user_id", "ts", "event_id", "delta")
      .orderBy("user_id")
  }

  val clampedWalletSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns,
      |    CASE WHEN event_type IN ('purchase', 'signup')
      |         THEN CAST(FLOOR(value * 100) AS BIGINT)
      |         WHEN event_type = 'error'
      |         THEN -CAST(FLOOR(value * 100) AS BIGINT)
      |         ELSE 0 END AS d
      |  FROM events),
      |nz AS (SELECT * FROM e WHERE d <> 0),
      |r0 AS (SELECT user_id, event_id, tns,
      |    SUM(d) OVER (PARTITION BY user_id ORDER BY tns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM nz),
      |r AS (SELECT user_id, event_id, tns, s,
      |    MIN(s) OVER (PARTITION BY user_id ORDER BY tns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY tns, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS nr
      |  FROM r0),
      |b AS (SELECT user_id, rn, nr,
      |    s - LEAST(0, COALESCE(LEAST(pm, s), s)) AS bal,
      |    CASE WHEN s < LEAST(0, COALESCE(pm, 0)) THEN 1 ELSE 0 END
      |      AS fl
      |  FROM r)
      |SELECT user_id,
      |  CAST(MAX(CASE WHEN rn = nr THEN bal END) AS BIGINT)
      |    AS end_balance,
      |  CAST(MAX(bal) AS BIGINT) AS peak_balance,
      |  CAST(SUM(fl) AS BIGINT) AS n_floor_events
      |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q208: two-hop recommendations ([[Graph.twoHopPairs]]) over the
    * q107 part co-purchase graph — "also bought with" pairs that are
    * NOT directly co-purchased, scored by common neighbors; hub
    * middles excluded by the visible degree cap. Top 30.
    */
  def twoHopParts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val small = li.groupBy(col("ok")).agg(count(lit(1)).as("n"))
      .where(col("n") <= 6).select(col("ok"))
    val li2 = li.join(small, Seq("ok"), "leftsemi")
    val pairs = li2.as("x").join(li2.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    Graph.twoHopPairs(pairs, maxMiddleDegree = 64L)
      .orderBy(col("n_common").desc, col("a").asc, col("b").asc)
      .limit(30)
  }

  val twoHopPartsSql: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |ok6 AS (SELECT ok FROM li GROUP BY ok HAVING COUNT(*) <= 6),
      |li2 AS (SELECT li.* FROM li JOIN ok6 USING (ok)),
      |e AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b FROM li2 x
      |  JOIN li2 y ON x.ok = y.ok AND x.pk < y.pk),
      |adj AS MATERIALIZED (SELECT a AS id, b AS nb FROM e
      |  UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT id, COUNT(*) AS deg FROM adj GROUP BY id),
      |mids AS (SELECT id FROM deg WHERE deg <= 64),
      |bm AS (SELECT adj.id, adj.nb FROM adj
      |  JOIN mids ON mids.id = adj.nb),
      |wp AS (SELECT e1.id AS a, e2.id AS b FROM bm e1
      |  JOIN bm e2 ON e2.nb = e1.nb AND e1.id < e2.id),
      |nd AS (SELECT wp.a, wp.b FROM wp
      |  WHERE NOT EXISTS (SELECT 1 FROM e
      |    WHERE e.a = wp.a AND e.b = wp.b))
      |SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common
      |FROM nd GROUP BY a, b
      |ORDER BY n_common DESC, a ASC, b ASC LIMIT 30""".stripMargin

  /** q209: changepoint by segmented least squares
    * ([[Stats.bestBreakpoint]]) — which year boundary best splits each
    * return flag's daily-revenue trend into two linear regimes. The
    * SAME Scala literal list feeds the operator and the oracle, which
    * replays the 12-sum moment aggregation, both SSE closes, the fixed
    * two-segment add, and the argmin tie rule.
    */
  private[graft] val BreakCandidates: Seq[Long] =
    (1993 to 1998).map(y => java.time.LocalDate.of(y, 1, 1).toEpochDay)

  def breakpointRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01")).as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("rev"))
    Stats.bestBreakpoint(daily, Seq("l_returnflag"), "day", "rev",
        BreakCandidates)
      .orderBy("l_returnflag")
  }

  val breakpointRevenueSql: String = {
    val cands = BreakCandidates.mkString("(", "), (", ")")
    s"""WITH d AS (SELECT l_returnflag AS g,
       |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
       |      AS x,
       |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
       |      AS BIGINT) AS y
       |  FROM lineitem GROUP BY 1, 2),
       |r AS (SELECT d.g, d.x, d.y, b.b,
       |    CASE WHEN d.x >= b.b THEN 1 ELSE 0 END AS seg
       |  FROM d CROSS JOIN (VALUES $cands) b(b)),
       |m AS (SELECT g, b,
       |    SUM(CASE WHEN seg = 0 THEN 1 ELSE 0 END) AS n0,
       |    SUM(CASE WHEN seg = 0 THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx0,
       |    SUM(CASE WHEN seg = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy0,
       |    SUM(CASE WHEN seg = 0 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx0,
       |    SUM(CASE WHEN seg = 0 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy0,
       |    SUM(CASE WHEN seg = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy0,
       |    SUM(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS n1,
       |    SUM(CASE WHEN seg = 1 THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx1,
       |    SUM(CASE WHEN seg = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy1,
       |    SUM(CASE WHEN seg = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx1,
       |    SUM(CASE WHEN seg = 1 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy1,
       |    SUM(CASE WHEN seg = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy1
       |  FROM r GROUP BY 1, 2),
       |sc AS (SELECT g, b, n0, n1,
       |    (CASE WHEN n0 = 0 THEN 0.0
       |      WHEN n0 >= 2 AND CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
       |          - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE) > 0.0
       |      THEN ((CAST(n0 AS DOUBLE) * CAST(syy0 AS DOUBLE)
       |          - CAST(sy0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
       |        - (CAST(n0 AS DOUBLE) * CAST(sxy0 AS DOUBLE)
       |          - CAST(sx0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
       |          * (CAST(n0 AS DOUBLE) * CAST(sxy0 AS DOUBLE)
       |          - CAST(sx0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
       |          / (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
       |          - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)))
       |        / CAST(n0 AS DOUBLE)
       |      ELSE (CAST(n0 AS DOUBLE) * CAST(syy0 AS DOUBLE)
       |          - CAST(sy0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
       |        / CAST(n0 AS DOUBLE) END
       |    + CASE WHEN n1 = 0 THEN 0.0
       |      WHEN n1 >= 2 AND CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
       |          - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) > 0.0
       |      THEN ((CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE)
       |          - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
       |        - (CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE)
       |          - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
       |          * (CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE)
       |          - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
       |          / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
       |          - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)))
       |        / CAST(n1 AS DOUBLE)
       |      ELSE (CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE)
       |          - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
       |        / CAST(n1 AS DOUBLE) END) AS sse
       |  FROM m)
       |SELECT g AS l_returnflag, b AS best_break,
       |  CAST(FLOOR(sse / 1000000.0) AS BIGINT) AS sse_div1e6,
       |  CAST(n0 AS BIGINT) AS n_before, CAST(n1 AS BIGINT) AS n_after
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
       |    ORDER BY sse ASC, b ASC) AS rn FROM sc)
       |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin
  }

  /** q210: Shannon entropy profile ([[Profile.entropyReport]]) of the
    * categorical columns — information content per column with the
    * per-term floor-e6 quantization that keeps the ln sum an exact
    * integer pipeline (the q158 DCG rule). Null counts as a value.
    */
  def entropyProfile(s: SparkSession, dir: String): DataFrame =
    Profile.entropyReport(t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus", "l_quantity", "l_suppkey"))
      .orderBy("column")

  val entropyProfileSql: String =
    """WITH u AS (
      |  SELECT 'l_returnflag' AS col, CAST(l_returnflag AS VARCHAR) AS v
      |    FROM lineitem
      |  UNION ALL SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR)
      |    FROM lineitem
      |  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS VARCHAR)
      |    FROM lineitem
      |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR)
      |    FROM lineitem),
      |c AS (SELECT col, v, COUNT(*) AS c FROM u GROUP BY 1, 2),
      |a AS (SELECT col, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |    CAST(SUM(CAST(FLOOR(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
      |      * 1000000.0) AS BIGINT)) AS BIGINT) AS st
      |  FROM c GROUP BY 1)
      |SELECT col AS column, n, n_distinct,
      |  (CAST(FLOOR(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
      |    * 1000000.0) AS BIGINT) - st) // n AS entropy_e6
      |FROM a ORDER BY col""".stripMargin

  /** q211: sorted-neighborhood near-dup blocking
    * ([[Dedup.sortedNeighborhoodPairs]], Hernández–Stolfo) — the third
    * blocking family (sort windows vs LSH's hash buckets vs deletion
    * neighborhoods), verified by exact token Jaccard. The oracle
    * replays the sorted-token key, the prefix block, the rank window,
    * the offset join, and every Jaccard.
    */
  def sortedNeighborhood(s: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairs(t(s, dir, "documents"),
        "doc_id", "text", window = 5, threshold = 0.7)
      .orderBy("id_a", "id_b")

  val sortedNeighborhoodSql: String =
    s"""WITH tok AS (SELECT doc_id AS id,
       |    list_sort(list_distinct($duckToks)) AS ts
       |  FROM documents WHERE text IS NOT NULL),
       |nz AS (SELECT id, ts, array_to_string(ts, ' ') AS key
       |  FROM tok WHERE len(ts) > 0),
       |rk AS (SELECT id, ts, substr(key, 1, 2) AS blk,
       |    row_number() OVER (PARTITION BY substr(key, 1, 2)
       |      ORDER BY key ASC, id ASC) AS rn
       |  FROM nz),
       |cand AS (SELECT a.id AS ia, b.id AS ib, a.ts AS ta, b.ts AS tb
       |  FROM rk a JOIN rk b ON b.blk = a.blk
       |    AND b.rn BETWEEN a.rn + 1 AND a.rn + 5),
       |j AS (SELECT LEAST(ia, ib) AS id_a, GREATEST(ia, ib) AS id_b,
       |    round(CAST(len(list_intersect(ta, tb)) AS DOUBLE)
       |      / (len(ta) + len(tb) - len(list_intersect(ta, tb))), 4)
       |      AS jaccard
       |  FROM cand)
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.7
       |ORDER BY id_a, id_b""".stripMargin

  /** q212: blocking-strategy evaluation — sorted-neighborhood recall
    * against the EXACT word-unit Jaccard truth ([[SetSimJoin]]):
    * n_true, n_found, hits, completeness ppm, and the candidate
    * reduction vs all pairs. The honest readout every blocking choice
    * owes its users (the no-silent-caps rule, applied to recall).
    */
  def blockingEval(s: SparkSession, dir: String): DataFrame = {
    // one language (the q168 scoping): WORD-unit exact truth over the
    // full corpus is the prefix filter's dense-vocab worst case
    // (measured 79 s at sf0.1); the evaluation question is
    // per-language anyway
    val docs = t(s, dir, "documents").where(col("lang") === "en")
    // materialize both pair sets ONCE — each feeds two branches of the
    // one-row report (count + hit join), and a lazy plan would run the
    // whole join twice
    val truth = SetSimJoin.tokenJaccardSelfPairs(docs, "doc_id", "text",
        thresholdPpm = 800000L)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val found = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        window = 5, threshold = 0.8)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val nDocs = docs.where(col("text").isNotNull)
      .agg(count(lit(1)).as("n_docs"))
    val nt = truth.agg(count(lit(1)).as("n_true"))
    val nf = found.agg(count(lit(1)).as("n_found"))
    val hit = found.join(truth, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    nDocs.crossJoin(nt).crossJoin(nf).crossJoin(hit)
      .withColumn("completeness_ppm",
        when(col("n_true") > 0, expr("n_hits * 1000000L div n_true")))
  }

  val blockingEvalSql: String =
    s"""WITH tok AS (SELECT doc_id AS id,
       |    list_sort(list_distinct($duckToks)) AS ts
       |  FROM documents WHERE text IS NOT NULL AND lang = 'en'),
       |nz AS (SELECT id, ts, array_to_string(ts, ' ') AS key
       |  FROM tok WHERE len(ts) > 0),
       |truth AS (SELECT a.id AS id_a, b.id AS id_b
       |  FROM nz a JOIN nz b ON a.id < b.id
       |  WHERE CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) * 1000000
       |    >= CAST(len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
       |       AS BIGINT) * 800000),
       |rk AS (SELECT id, ts, substr(key, 1, 2) AS blk,
       |    row_number() OVER (PARTITION BY substr(key, 1, 2)
       |      ORDER BY key ASC, id ASC) AS rn
       |  FROM nz),
       |found AS (SELECT DISTINCT LEAST(a.id, b.id) AS id_a,
       |    GREATEST(a.id, b.id) AS id_b
       |  FROM rk a JOIN rk b ON b.blk = a.blk
       |    AND b.rn BETWEEN a.rn + 1 AND a.rn + 5
       |  WHERE round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
       |      / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))),
       |      4) >= 0.8),
       |m AS (SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
       |     WHERE text IS NOT NULL AND lang = 'en') AS n_docs,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM found) AS n_found,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM found f
       |     WHERE EXISTS (SELECT 1 FROM truth t
       |       WHERE t.id_a = f.id_a AND t.id_b = f.id_b)) AS n_hits)
       |SELECT n_docs, n_true, n_found, n_hits,
       |  CASE WHEN n_true > 0 THEN n_hits * 1000000 // n_true END
       |    AS completeness_ppm
       |FROM m""".stripMargin

  /** q213: NATIVE session windows — Spark's `session_window()`
    * (SessionWindow/TimeWindow family, the engine-native sibling of
    * the custom [[Sessionize]] operator): 30-minute-gap sessions per
    * user as one groupBy, no window/state code. Semantics pinned by
    * the oracle's islands replay: events merge while the gap is
    * STRICTLY under 30 min (the window is [start, last+gap)), session
    * end = last event + gap.
    */
  def nativeSessionWindows(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("tstamp"),
        floor(col("value") * 100).cast("long").as("cents"))
    e.groupBy(col("user_id"),
        session_window(col("tstamp"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("cents"))
      .orderBy("user_id", "start_us")
  }

  val nativeSessionWindowsSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
      |l AS (SELECT user_id, us, cents,
      |    LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS pus
      |  FROM e),
      |o AS (SELECT user_id, us, cents,
      |    CASE WHEN pus IS NULL OR us - pus >= 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM l),
      |s AS (SELECT user_id, us, cents,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM o)
      |SELECT user_id, CAST(MIN(us) AS BIGINT) AS start_us,
      |  CAST(MAX(us) + 1800000000 AS BIGINT) AS end_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(cents) AS BIGINT) AS cents
      |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin

  /** q214: SKYLINE (Pareto frontier) — parts not dominated on the
    * (min price ASC-better, max quantity DESC-better) plane: the
    * classic preference-query operator, computed WITHOUT the naive
    * all-pairs dominance join: under the total order (price ASC, qty
    * DESC, id ASC) every dominator precedes its victim, so one
    * running-max window decides dominance in a single pass (duplicate
    * profiles keep the lowest id — the deterministic convention).
    * The window is global but DIMENSION-grain (the part summary table,
    * never facts — the equiDepthBins boundedness rule). The oracle is
    * the brute-force NOT EXISTS dominance definition — a different
    * algorithm, same frontier.
    */
  def skylineParts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (floor-mean price, total quantity): a plane with a real frontier
    // — min/max profiles collapse to one dominator on this data
    val parts = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(expr("sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) " +
          "div count(1)").as("best_price"),
        sum(floor(col("l_quantity")).cast("long")).as("best_qty"))
    // part-grain global window (input is the per-partkey aggregate)
    val w = Window.orderBy(col("best_price").asc, col("best_qty").desc,
        col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    parts.withColumn("__rm", max(col("best_qty")).over(w))
      .where(col("__rm").isNull || col("best_qty") > col("__rm"))
      .drop("__rm")
      .orderBy("best_price", "l_partkey")
  }

  val skylinePartsSql: String =
    """WITH p AS (SELECT l_partkey,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
      |      // COUNT(*) AS BIGINT) AS best_price,
      |    CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
      |      AS best_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT l_partkey, best_price, best_qty FROM p
      |WHERE NOT EXISTS (SELECT 1 FROM p q
      |  WHERE q.best_price <= p.best_price AND q.best_qty >= p.best_qty
      |    AND (q.best_price < p.best_price OR q.best_qty > p.best_qty
      |         OR q.l_partkey < p.l_partkey))
      |ORDER BY best_price, l_partkey""".stripMargin

  /** q215: BITEMPORAL as-known-at query — two time axes: what was the
    * order book VALID on V = 1996-01-01, AS KNOWN ON R = 1996-06-01,
    * over a corrections log (every order recorded at its order date;
    * every third order re-recorded 10 days later with a +10% price
    * correction)? Belief selection = latest version with recorded ≤ R
    * per order (one window), validity = orderdate ≤ V (a filter) —
    * the audit query SCD2 alone (one axis) cannot answer.
    */
  def bitemporalBook(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_orderstatus"), to_date(col("o_orderdate")).as("odate"),
      col("o_totalprice"))
    val v1 = o.select(col("o_orderkey"), col("o_orderstatus"),
      col("odate"), col("odate").as("recorded"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val v2 = o.where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("odate"),
        date_add(col("odate"), 10).as("recorded"),
        floor(col("o_totalprice") * 110).cast("long").as("cents"))
    val log = v1.unionByName(v2)
    val known = log.where(col("recorded") <= lit("1996-06-01"))
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("recorded").desc)
    known.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("odate") <= lit("1996-01-01"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("book_cents"))
      .orderBy("o_orderstatus")
  }

  val bitemporalBookSql: String =
    """WITH o AS (SELECT o_orderkey, o_orderstatus,
      |    CAST(o_orderdate AS DATE) AS odate, o_totalprice FROM orders),
      |log AS (
      |  SELECT o_orderkey, o_orderstatus, odate, odate AS recorded,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM o
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, odate, odate + 10,
      |    CAST(FLOOR(o_totalprice * 110) AS BIGINT) FROM o
      |  WHERE o_orderkey % 3 = 0),
      |known AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |    ORDER BY recorded DESC) AS rn
      |  FROM log WHERE recorded <= DATE '1996-06-01')
      |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(cents) AS BIGINT) AS book_cents
      |FROM known WHERE rn = 1 AND odate <= DATE '1996-01-01'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q216: personalized PageRank ([[Graph.personalizedPageRank]],
    * restart to customers {1, 2, 3}, 6 iterations) over the q97
    * customer↔part graph — importance RELATIVE to a seed history, the
    * recommend-from-history walk. The oracle unrolls all six
    * iterations of the identical seed-grossed integer arithmetic.
    * Top 25 NON-seed nodes by (rank, id).
    */
  def pprParts(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val fwd = l.join(broadcast(o), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    Graph.personalizedPageRank(edges, Seq(1L, 2L, 3L), iterations = 6)
      .where(!col("id").isin(1L, 2L, 3L))
      .orderBy(col("rank").desc, col("id").asc).limit(25)
  }

  val pprPartsSql: String = {
    val iters = (1 to 6).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.id,
         |    (CASE WHEN n.id IN (1, 2, 3)
         |       THEN (nn.n * 150000000000) // 3 ELSE 0 END)
         |    + (85 * COALESCE(inf.s, 0)) // 100 AS rank
         |  FROM nodes n CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(r.rank // deg.d) AS BIGINT) AS s
         |    FROM r${i - 1} r JOIN e ON e.src = r.id
         |    JOIN deg ON deg.src = r.id
         |    GROUP BY e.dst) inf ON inf.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH fwd AS (
       |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
       |    CAST(l.l_partkey + 10000000 AS BIGINT) AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |e AS MATERIALIZED (SELECT src, dst FROM fwd
       |  UNION SELECT dst, src FROM fwd),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |r0 AS (SELECT n.id, CASE WHEN n.id IN (1, 2, 3)
       |    THEN (nn.n * 150000000000) // 3 ELSE CAST(0 AS BIGINT) END
       |    AS rank
       |  FROM nodes n CROSS JOIN nn),
       |$iters
       |SELECT id, rank FROM r6 WHERE id NOT IN (1, 2, 3)
       |ORDER BY rank DESC, id ASC LIMIT 25""".stripMargin
  }
}
