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
private[graft] trait QueriesStreaming { this: Queries.type =>
  // --------------------------------------------------------------- streaming
  /** The Structured Streaming windowed aggregation run in BATCH mode over
    * the events table — same transform object
    * ([[graft.streaming.StreamOps.windowedCounts]]), proving the
    * streaming path and the batch oracle compute identical results.
    * events.ts arrives as raw nanos (nanosAsLong) and is converted to a
    * timestamp first.
    */
  def streamWindows(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(
      // integer division: `/` on longs is DOUBLE division in Spark SQL,
      // and a double ulp at ~1.5e18 nanos is 256 ns — enough to round a
      // just-below-boundary event into the next window vs the oracle
      timestamp_micros(expr("ts div 1000")).as("ts"),
      col("event_type"), col("value"))
    graft.streaming.StreamOps.windowedCounts(ev, "10 minutes", "5 minutes")
      .select(col("window_start").cast("long").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  val streamWindowsSql: String =
    """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start,
      |  event_type, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** K-modes over the documents table — the ML operator applied to the
    * LLM-pipeline data: cluster documents by (lang, source, length
    * decile). Iterative ⇒ rows-only.
    */
  def kmodesDocuments(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "documents").select(KModes.assemble(
      col("lang"), col("source"),
      floor(col("n_chars") / 100).cast("int")).as("features"))
    // portable-init mode + full Lloyd replay oracle, like q14
    val model = new KModes().setK(6).setMaxIter(10).setSeed(42L)
      .setInitHash("md5").fit(df)
    model.transform(df).groupBy("prediction").count().orderBy("prediction")
  }

  private[graft] val documentFeatureSqlCols = Seq(
    "lang", "source",
    "CAST(CAST(FLOOR(n_chars / 100) AS INT) AS VARCHAR)")
    .map(e => s"COALESCE($e, '∅')")

  val kmodesDocumentsSql: String =
    lloydReplaySql("documents", documentFeatureSqlCols,
      k = 6, maxIter = 10, seed = 42L)

  /** Vector normalization through the SQL surface: the injected
    * graft_* functions ([[GraftExtensions]]) running in a plain
    * spark.sql query, oracled against DuckDB list arithmetic (the
    * oracle mirrors the kernel's multiply-by-reciprocal exactly).
    */
  def vectorNorms(s: SparkSession, dir: String): DataFrame = {
    GraftExtensions.register(s) // idempotent; driver-owned sessions too
    t(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
    s.sql(
      """SELECT vec_id,
        |  round(element_at(graft_l2_normalize(CAST(embedding AS ARRAY<DOUBLE>)), 1), 6) AS u1,
        |  round(sqrt(graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                       CAST(embedding AS ARRAY<DOUBLE>))), 6) AS norm
        |FROM embeddings_v ORDER BY vec_id""".stripMargin)
  }

  val vectorNormsSql: String =
    """SELECT vec_id,
      |  round(v[1] * (1.0 / sqrt(list_dot_product(v, v))), 6) AS u1,
      |  round(sqrt(list_dot_product(v, v)), 6) AS norm
      |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |ORDER BY vec_id""".stripMargin
}
