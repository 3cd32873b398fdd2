package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * end-to-end K-modes fit on orders (SURVEY §8.2 M0).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.kmodesFitGlobal(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2-§3. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for the ensemble fit (q15 —
    * partition-dependent by reference semantics; driver records a
    * rows-only check, a golden-snapshot spec pins the values); every
    * other query — including the iterative Lloyd fits (full-algorithm
    * replay), the approximate LSH/ANN/simhash paths (replayed algorithm
    * or certified 100%-recall parameters) and the image decoders
    * (integer-exact stats) — carries an exact oracle; see the
    * per-query scaladoc. */
  def oracleSql: Map[String, String] = Queries.oracles
}
