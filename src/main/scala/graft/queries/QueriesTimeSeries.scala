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
private[graft] trait QueriesTimeSeries { this: Queries.type =>
  // ----------------------------------------------------------- time series
  /** Zero-filled daily event counts: aggregate to day grain, then
    * explode the full min..max calendar (`sequence`) and left-join the
    * observed days — the resample/gap-fill shape every time-series
    * pipeline needs (a naive groupBy silently drops empty days). The
    * calendar side is day-grain (≤ thousands of rows at any corpus
    * size), so the join broadcasts; the heavy reduction happened in the
    * one groupBy scan.
    */
  def gapFillDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .where(col("o_totalprice") > 450000) // sparse series: ~47% of days empty
      .select(to_date(col("o_orderdate")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_orders"))
    val cal = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    cal.join(daily, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  val gapFillDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      |  FROM orders WHERE o_totalprice > 450000 GROUP BY 1),
      |cal AS (
      |  SELECT CAST(unnest(generate_series(
      |    (SELECT MIN(day) FROM daily)::TIMESTAMP,
      |    (SELECT MAX(day) FROM daily)::TIMESTAMP,
      |    INTERVAL 1 DAY)) AS DATE) AS day)
      |SELECT strftime(cal.day, '%Y-%m-%d') AS day, COALESCE(daily.n, 0) AS n_orders
      |FROM cal LEFT JOIN daily USING (day) ORDER BY day""".stripMargin

  /** Trailing 7-day revenue per order day: a TIME-RANGE window frame
    * (`rangeBetween` on the day ordinal), not a row frame — days with
    * no neighbors within 6 days sum only themselves. Money goes through
    * DECIMAL (exact, order-independent) and back to double at the end.
    * The window runs over the already-aggregated day-grain table
    * (≤ thousands of rows regardless of input size), so the single
    * unpartitioned WindowExec is not a scale concern.
    */
  def rollingRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    // day-grain global window (calendar-bounded aggregate input)
    val w = Window.orderBy(col("ord")).rangeBetween(-6, 0)
    daily
      .withColumn("ord", datediff(col("day"), to_date(lit("1970-01-01"))))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("rev").cast("double").as("day_rev"),
        sum(col("rev")).over(w).cast("double").as("rev_7d"))
      .orderBy("day")
  }

  val rollingRevenueSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(rev AS DOUBLE) AS day_rev,
      |  CAST(SUM(rev) OVER (
      |    ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS rev_7d
      |FROM daily ORDER BY day""".stripMargin
}
