package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching WITHOUT the all-pairs scan: SymSpell-
  * style deletion-neighborhood blocking. Two strings within Levenshtein
  * distance 1 (one substitution, insertion, or deletion) ALWAYS share a
  * member of each other's single-deletion neighborhood — delete the
  * differing position from whichever side carries it — so joining on
  * the (len+1)-element neighborhood {s} ∪ {s minus position i} is a
  * COMPLETE candidate generator for maxDist = 1: every true pair
  * survives; the final `levenshtein(...) ≤ 1` filter is exact, not a
  * heuristic. (The record-linkage "blocking" step with a proof instead
  * of a prayer — prefix or phonetic blocking silently loses pairs.)
  *
  * Shape: one narrow deletion-explode (fan-out = len+1, bounded by
  * `maxLen`) → groupBy(variant) collects id lists → pair fan-out runs
  * NARROWLY per bucket (the Basket sorted-array idiom, no self-join)
  * → distinct candidate pairs (a true pair shares up to 3 variants) →
  * strings hydrate per candidate for the exact verify. No all-pairs
  * anywhere; the only shuffles are variant-grain and pair-grain.
  *
  * Guards, both raising pointedly (exactness means silent capping is
  * not an option): a string longer than `maxLen` (fan-out + memory per
  * row), and a variant bucket over `maxBucketSize` ids (a hub variant
  * — "the empty-ish key" — would go quadratic; at real scale filter
  * such junk keys upstream or raise the cap deliberately).
  */
object FuzzyJoin {

  /** All pairs (id_a < id_b) with levenshtein(str_a, str_b) ≤ maxDist
    * (1 or 2), hydrated with both strings and the exact distance.
    * maxDist = 2 uses the depth-2 deletion neighborhood (s, all
    * single deletes, all double deletes — ~len²/2 variants per
    * string, the SymSpell completeness bound for distance 2); the
    * exact verify keeps the result precise either way.
    */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
                maxDist: Int = 1, maxLen: Int = 64,
                maxBucketSize: Int = 4096): DataFrame = {
    require(maxLen >= 1 && maxLen <= 1000, "maxLen in [1, 1000]")
    require(maxDist == 1 || maxDist == 2,
      "maxDist in {1, 2} — beyond 2 the deletion neighborhood is " +
        "cubic-plus per string; block on a different key instead")
    val rows = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .where(col("id").isNotNull && col("s").isNotNull)
    // del1(u): u minus each single position
    def del1(u: String) =
      s"""transform(sequence(1, greatest(length($u), 1)),
         |  i -> concat(substr($u, 1, i - 1), substr($u, i + 1, $maxLen)))"""
        .stripMargin
    val neighborhood =
      if (maxDist == 1) s"concat(array(s), ${del1("s")})"
      else s"""concat(array(s), ${del1("s")},
              |  flatten(transform(${del1("s")}, t -> ${del1("t")})))"""
        .stripMargin
    val variants = rows.select(col("id"), explode(expr(
      s"""CASE WHEN length(s) <= $maxLen THEN
         |  array_distinct($neighborhood)
         |ELSE raise_error(concat('FuzzyJoin: string of length ',
         |  cast(length(s) AS string), ' exceeds maxLen=$maxLen; raise ',
         |  'maxLen or pre-truncate the join key'))
         |END""".stripMargin)).as("variant"))
    val cands = variants
      .groupBy(col("variant"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .select(explode(expr(
        s"""CASE WHEN size(ids) <= $maxBucketSize THEN
           |  flatten(transform(ids, (x, i) ->
           |    transform(slice(ids, i + 2, size(ids)),
           |              y -> struct(x AS id_a, y AS id_b))))
           |ELSE raise_error(concat('FuzzyJoin: variant bucket holds ',
           |  cast(size(ids) AS string), ' ids (> $maxBucketSize); a hub ',
           |  'variant goes quadratic - filter junk keys or raise the cap'))
           |END""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    cands
      .join(rows.select(col("id").as("id_a"), col("s").as("name_a")), Seq("id_a"))
      .join(rows.select(col("id").as("id_b"), col("s").as("name_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"), col("dist"))
  }

  /** Entity-resolution GOLDEN RECORDS — the [[selfPairs]] →
    * connected-components → survivorship capstone (the master-data
    * "merge/purge" every CRM-grade pipeline runs): records whose join
    * keys are within edit distance 1 cluster transitively
    * ([[Dedup.connectedComponents]] — A~B, B~C puts A,C in one entity
    * even at distance 2, exactly like the near-dup groups of q35), and
    * each cluster elects ONE surviving record by (score DESC, id ASC)
    * — deterministic total order, no max_by tie coin-flips.
    *
    * `scoreCol` is cast to double for the bounded [[TopKAgg]] pick;
    * pass an exact value (integer, or floats floor-scaled first) so
    * the comparison is engine-replayable. Records matching nothing are
    * their own entity (group_id = id). NULL ids/keys are excluded, as
    * in [[selfPairs]].
    *
    * 100 TB shape: candidate pairs come from the deletion-neighborhood
    * blocking (never all-pairs), CC runs pointer-jumping over the
    * pair-sized edge list, and the election is one bounded aggregate —
    * O(groups) output, no window over the full record set. The only
    * full-table shuffles are the blocking explode and the final
    * group_id aggregation.
    *
    * @return (group_id = min member id, n_members, golden_id,
    *         golden_key, golden_score_e0 — the elected record's score
    *         cast back to long)
    */
  def goldenRecords(df: DataFrame, idCol: String, strCol: String,
                    scoreCol: String, maxLen: Int = 64,
                    maxBucketSize: Int = 4096): DataFrame = {
    val recs = df.select(col(idCol).cast("long").as("id"),
        col(strCol).as("__key"), col(scoreCol).cast("double").as("__score"))
      .where(col("id").isNotNull && col("__key").isNotNull)
    val pairs = selfPairs(df, idCol, strCol, 1, maxLen, maxBucketSize)
    val cc = Dedup.connectedComponents(pairs)
    val labeled = recs.join(cc, Seq("id"), "left")
      .withColumn("group_id", coalesce(col("group_id"), col("id")))
    val elected = labeled.groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_members"),
        TopKAgg.topK(col("__score"), col("id"), 1)(0).as("__top"))
      .select(col("group_id"), col("n_members"), col("__top.id").as("golden_id"))
    elected.join(recs.select(col("id").as("golden_id"),
        col("__key").as("golden_key"),
        col("__score").cast("long").as("golden_score")), Seq("golden_id"))
      .select(col("group_id"), col("n_members"), col("golden_id"),
        col("golden_key"), col("golden_score"))
  }
}
