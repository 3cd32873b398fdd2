package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair mining: co-occurrence support / confidence / lift
  * over (basket, item) rows — the classic association-rule screen a
  * corpus team runs over "documents × sources", "orders × parts", or
  * "sessions × features" to find what travels together.
  *
  * Shape: distinct (basket, item) → ONE shuffle groups each basket into
  * a sorted item array (map-side combined `collect_set`-style; the
  * quadratic pair fan-out then happens NARROWLY per row via a codegen'd
  * nested `transform`, never a self-join) → one map-side-combined
  * groupBy(pair) count → item supports join in (no broadcast hint — a
  * web-scale item vocabulary is not broadcastable; AQE promotes when
  * small) → all-integer ppm metrics.
  *
  * Why not a self-join on basket? Same shuffle volume, but the join
  * materializes each basket twice and gives no natural place to bound
  * the fan-out. The array form guards it for free: a basket with more
  * than `maxBasketSize` distinct items RAISES a pointed error (one hub
  * basket at 100 TB — "the null user" — would otherwise explode
  * quadratically and take the stage down with an opaque OOM).
  *
  * Exactness: counts are integers; support/confidence are `x*1e6 div n`
  * floor-ppm; lift is the two-stage floor
  * `(pair*1e6 div count_a) * n_baskets div count_b` — deterministic and
  * engine-identical (pure BIGINT ops), documented truncation bias ≤ a
  * few ppm vs real division, overflow-safe to ~1e12 baskets
  * (count*1e6 < 2^63).
  */
object Basket {

  /** All item pairs with pair_count ≥ minSupport, with support,
    * both-direction confidence, and lift in floor-ppm.
    *
    * @return (item_a, item_b, pair_count, count_a, count_b,
    *         support_ppm, conf_ab_ppm, conf_ba_ppm, lift_ppm) with
    *         item_a < item_b
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long, maxBasketSize: Int = 4096): DataFrame = {
    val items = df
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .where(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val baskets = items.groupBy(col("basket"))
      .agg(array_sort(collect_list(col("item"))).as("arr"))
    // the guard lives INSIDE the consumed expression (IntervalJoin
    // idiom) — a standalone guard column would be pruned away unread
    val pairs = baskets.select(explode(expr(
      s"""CASE WHEN size(arr) <= $maxBasketSize THEN
         |  flatten(transform(arr, (x, i) ->
         |    transform(slice(arr, i + 2, size(arr)),
         |              y -> struct(x AS item_a, y AS item_b))))
         |ELSE raise_error(concat('Basket: basket ', cast(basket AS string),
         |  ' holds > $maxBasketSize distinct items; pair fan-out is ',
         |  'quadratic - filter hub baskets or raise maxBasketSize'))
         |END""".stripMargin))
      .as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .where(col("pair_count") >= minSupport)
    val itemCounts = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val n = items.select(col("basket")).distinct()
      .agg(count(lit(1)).as("__n"))
    pairs
      .join(itemCounts.select(col("item").as("item_a"), col("cnt").as("count_a")),
        Seq("item_a"))
      .join(itemCounts.select(col("item").as("item_b"), col("cnt").as("count_b")),
        Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        col("count_a"), col("count_b"),
        expr("pair_count * 1000000L div __n").as("support_ppm"),
        expr("pair_count * 1000000L div count_a").as("conf_ab_ppm"),
        expr("pair_count * 1000000L div count_b").as("conf_ba_ppm"),
        expr("(pair_count * 1000000L div count_a) * __n div count_b")
          .as("lift_ppm"))
  }

  /** Item-item COLLABORATIVE-FILTERING similarity — the co-occurrence
    * recommender ("customers who bought X also bought Y"): cosine over
    * binary basket-membership vectors, which collapses to
    * n_xy / √(n_x · n_y) on the SAME pair/item counts [[pairRules]]
    * builds — so the whole sparse similarity matrix costs one guarded
    * narrow pair fan-out, never a user×item matrix product. Per-item
    * top-k via the bounded [[TopKAgg]] (no window over the pair set).
    *
    * Determinism: counts are exact integers < 2^26 each, so
    * n_x · n_y < 2^52 converts to double exactly, √ is IEEE-correctly
    * rounded, and the single floor-e6 chain replays in any engine;
    * ranking compares the resulting integers (ties by neighbor id).
    *
    * 100 TB shape: inherits [[pairRules]]' bounds (minSupport prunes
    * the long tail, maxBasketSize kills hub baskets loudly); the
    * symmetrize is a projection-only union; shuffle volume after the
    * pair count is O(pairs), output O(items × k).
    *
    * @return (item, rank 1..≤k, neighbor, cos_e6)
    */
  def itemSimilarityTopK(df: DataFrame, basketCol: String, itemCol: String,
                         minSupport: Long, k: Int,
                         maxBasketSize: Int = 4096): DataFrame = {
    require(k >= 1)
    val pr = pairRules(df, basketCol, itemCol, minSupport, maxBasketSize)
      .select(col("item_a"), col("item_b"), col("pair_count"),
        col("count_a"), col("count_b"))
    val sym = pr.unionByName(pr.select(
      col("item_b").as("item_a"), col("item_a").as("item_b"),
      col("pair_count"), col("count_b").as("count_a"),
      col("count_a").as("count_b")))
    val cosE6 = floor(col("pair_count").cast("double") /
      sqrt((col("count_a") * col("count_b")).cast("double")) *
      lit(1000000.0)).cast("long")
    sym.withColumn("cos_e6", cosE6)
      .groupBy(col("item_a").cast("long").as("item"))
      .agg(TopKAgg.topK(col("cos_e6").cast("double"),
        col("item_b").cast("long"), k).as("top"))
      .select(col("item"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("item"), (col("pos") + 1).cast("long").as("rank"),
        col("p.id").as("neighbor"), col("p.val").cast("long").as("cos_e6"))
  }
}
