package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Report-shaping helpers over key-grain aggregates. */
object Rollup {

  /** The "top-n plus (others)" revenue table — every BI report's final
    * shape — WITHOUT a global sort: the key-grain aggregate feeds the
    * bounded [[TopKAgg]] (O(n) state, map-side combined) for the top
    * rows, and the "(others)" row is DERIVED arithmetically
    * (total − Σ top, key-count − n) from the same aggregate — the key
    * table is never ranked end-to-end, so a 1e9-key dimension costs
    * one shuffle plus two O(n)-state aggregates.
    *
    * Keys must cast losslessly to BIGINT (TopKAgg's id slot — hash or
    * dictionary-encode other keys first); measures are summed as
    * 64-bit integers (pass floor-cents, not doubles). The (others) row
    * always appears, zeroed when n covers every key, so the report
    * total is the table total by construction. Ties break
    * (value DESC, key ASC) — the oracle's window order.
    *
    * @return (rank, key, value_sum, n_keys) with key stringified and
    *         the (others) row at rank n+1
    */
  def topNOthers(df: DataFrame, keyCol: String, valueCol: String,
                 n: Int): DataFrame = {
    require(n >= 1 && n <= 10000, "n in [1, 10000]")
    val keyAgg = df
      .groupBy(col(keyCol).cast("long").as("k"))
      .agg(sum(col(valueCol).cast("long")).as("v"))
    val top = keyAgg
      .agg(TopKAgg.topK(col("v").cast("double"), col("k"), n).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "p")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("p.id").cast("string").as("key"),
        col("p.val").cast("long").as("value_sum"),
        lit(1L).as("n_keys"))
    val totals = keyAgg.agg(sum(col("v")).as("__total"),
      count(lit(1)).as("__nk"))
    val others = top
      .agg(coalesce(sum(col("value_sum")), lit(0L)).as("__topsum"),
        count(lit(1)).as("__topn"))
      .crossJoin(broadcast(totals))
      .select(lit(n + 1L).as("rank"), lit("(others)").as("key"),
        (coalesce(col("__total"), lit(0L)) - col("__topsum")).as("value_sum"),
        (coalesce(col("__nk"), lit(0L)) - col("__topn")).as("n_keys"))
    top.unionByName(others)
  }

  /** Exact money PRORATION — distribute a parent total across its
    * child rows proportionally to integer weights, with the classic
    * remainder rule: share_i = floor(total · w_i / W), and the cents
    * the floors dropped go to the FIRST child by `orderCol` (a
    * caller-named total order), so Σ shares = total EXACTLY per
    * parent — the invariant every financial allocation must keep and
    * float proration silently breaks. Zero-weight parents (W = 0)
    * allocate everything to the first child (documented; dropping the
    * money would violate the invariant).
    *
    * Int64 bound: total·w_i must fit — |total| < 2⁶³/W_max; amounts
    * and weights must be NON-NEGATIVE (floor-div sign divergence, the
    * usual rule — both sides RAISE).
    *
    * 100 TB posture: two parent-partitioned window passes (weight sum
    * + first-child rank) over the child grain, no join, no collect.
    */
  def prorate(
      df: DataFrame,
      parentCol: String,
      orderCol: String,
      weightCol: String,
      totalCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byParent = Window.partitionBy(col(parentCol))
    val ordered = Window.partitionBy(col(parentCol))
      .orderBy(col(orderCol).asc)
    val guardedW = when(col(weightCol) >= 0, col(weightCol).cast("long"))
      .otherwise(raise_error(lit(s"Rollup.prorate: negative $weightCol — " +
        "floor-div of negative products diverges between engines"))
        .cast("long"))
    val guardedT = when(col(totalCol) >= 0, col(totalCol).cast("long"))
      .otherwise(raise_error(lit(s"Rollup.prorate: negative $totalCol"))
        .cast("long"))
    df.withColumn("__w", guardedW)
      .withColumn("__t", guardedT)
      .withColumn("__ws", sum(col("__w")).over(byParent))
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__base",
        when(col("__ws") > 0, expr("(__t * __w) div __ws"))
          .otherwise(when(col("__rn") === 1, col("__t")).otherwise(0L)))
      .withColumn("__allocated", sum(col("__base")).over(byParent))
      .withColumn("alloc",
        col("__base") + when(col("__rn") === 1,
          col("__t") - col("__allocated")).otherwise(0L))
      .drop("__w", "__t", "__ws", "__rn", "__base", "__allocated")
  }

  /** Hierarchical (tree) rollup over a closed-form parent function —
    * per-node SUBTREE aggregates when the hierarchy is encoded in the
    * key itself (category = id div fanout, the standard synthetic-key
    * taxonomy): each leaf explodes its ancestor chain (id, id/f, id/f²,
    * … ≥ 1 — depth ≤ log_f(maxId), a LITERAL bound) and one map-side-
    * combined aggregation lands subtree (count, sum) per node. No
    * recursion, no self-join — the closed form makes the transitive
    * closure a projection, which is why synthetic taxonomy keys exist.
    */
  def hierarchyRollup(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      fanout: Int,
      maxDepth: Int = 16): DataFrame = {
    require(fanout >= 2, "fanout must be >= 2")
    require(maxDepth >= 1 && maxDepth <= 40, "maxDepth in [1, 40]")
    // exact long powers — math.pow loses integer exactness past 2^53
    // (fanout 13 at depth 15 already exceeds it), which would silently
    // hash leaves onto wrong ancestors
    val divisors = {
      val b = Seq.newBuilder[Long]
      var d = 1L
      var i = 0
      while (i < maxDepth && d <= Long.MaxValue / fanout) {
        b += d; d *= fanout; i += 1
      }
      b.result()
    }
    df.select(col(idCol).cast("long").as("__id"),
        col(valueCol).cast("long").as("__v"))
      .withColumn("__div", explode(typedlit(divisors)))
      .withColumn("node", expr("__id div __div"))
      .where(col("node") >= 1)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_leaves"), sum(col("__v")).as("subtree_sum"))
  }
}
