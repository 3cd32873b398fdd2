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
    * the same parquet tables. Omitted only for the iterative k-modes
    * fits (q14/q15/q33 — driver records a weaker rows-only check);
    * every other query, including the approximate LSH/ANN/simhash
    * paths, carries an exact oracle (replayed algorithm or certified
    * 100%-recall parameters — see the per-query scaladoc). */
  def oracleSql: Map[String, String] = Queries.oracles
}
