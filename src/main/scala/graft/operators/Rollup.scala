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
}
