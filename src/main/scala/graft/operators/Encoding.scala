package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical encoding for feature prep: a deterministic dense label
  * dictionary (code 0 = most frequent, ties by value ASC — the
  * frequency ordering every embedding-table builder wants, so code
  * ranges double as popularity ranges) and the join-based encode pass.
  *
  * 100 TB shape: the dictionary is ONE map-side-combined count at
  * vocab grain; the ranking window is unpartitioned but consumes the
  * AGGREGATE (the PlanSpec boundedness rule — a dictionary is by
  * definition vocab-sized, and if the vocab is data-sized you wanted a
  * hash, not a dictionary). Encoding is a plain equi-join the AQE
  * broadcast path collapses for real vocabularies; unseen values (new
  * categories at inference time) encode as NULL, loudly absent rather
  * than silently colliding.
  */
object Encoding {

  /** (value, code, cnt) — dense codes 0..|vocab|−1 by (cnt DESC,
    * value ASC). Null values are EXCLUDED (null is "missing", not a
    * category; impute first if you mean a category).
    */
  def labelDictionary(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("string").as("value"))
      .agg(count(lit(1)).as("cnt"))
    // vocab-grain global window (bounded by the aggregate beneath it)
    vocab.withColumn("code",
        (row_number().over(Window.orderBy(col("cnt").desc, col("value").asc))
          - 1).cast("long"))
      .select(col("value"), col("code"), col("cnt"))
  }

  /** Replace `valueCol` with its dictionary code (null for unseen). */
  def encode(df: DataFrame, valueCol: String, dict: DataFrame): DataFrame =
    df.join(dict.select(col("value").as(s"__enc_$valueCol"), col("code")),
        col(valueCol).cast("string") === col(s"__enc_$valueCol"), "left")
      .drop(valueCol, s"__enc_$valueCol")
      .withColumnRenamed("code", valueCol)
}
