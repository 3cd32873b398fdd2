package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native graft expressions.
  *
  * Two public wiring paths, both Spark-standard:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (or
  *    `SparkSession.builder.withExtensions(new GraftExtensions)`) — the
  *    injected functions resolve in pure SQL;
  *  - imperative: `GraftExtensions.register(spark)` on an existing
  *    session (what Verify/Bench do — the driver owns session creation).
  *
  * SQL names: graft_dot(a, b), graft_cosine(a, b), graft_l2_normalize(v),
  * graft_shingles(text, n), graft_hamming_assign(features, centers).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), builder))
    }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[graft] val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "graft_dot(a, b) - dot product of two array<double>",
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_cosine", "graft_cosine(a, b) - cosine similarity of two array<double>",
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("graft_l2_normalize", "graft_l2_normalize(v) - unit-normalize an array<double>",
      (es: Seq[Expression]) => L2Normalize(es(0))),
    ("graft_shingles", "graft_shingles(text, n) - distinct word n-gram shingles",
      (es: Seq[Expression]) => Shingles(es(0), intLit(es(1), "shingle size"))),
    ("graft_hamming_assign",
      "graft_hamming_assign(features, centers) - struct(prediction, min_dist) of nearest center",
      (es: Seq[Expression]) => HammingAssign(es(0), es(1))),
    // native AGGREGATES resolve through the same registry: the analyzer
    // wraps a bare AggregateFunction into AggregateExpression(Complete)
    ("graft_mode_array",
      "graft_mode_array(features) - per-slot mode of array<string> rows (count DESC, value ASC ties)",
      (es: Seq[Expression]) => graft.operators.ModeArrayAgg(es(0))),
    ("graft_top_k",
      "graft_top_k(value, id, k) - k largest (value, id) pairs, value DESC / id ASC; cast args to (double, bigint)",
      (es: Seq[Expression]) =>
        graft.operators.TopKAgg(es(0), es(1), intLit(es(2), "k"))))

  /** Imperative registration on an existing session. Idempotent AND
    * quiet: already-registered names are skipped, so re-registration
    * (e.g. a query calling this on a driver-owned session that Bench
    * already initialized) emits no "function replaced" warnings.
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      if (!org.apache.spark.sql.graft.Bridge.functionExists(spark, name))
        org.apache.spark.sql.graft.Bridge.registerFunction(spark, name, usage, builder)
    }
}
