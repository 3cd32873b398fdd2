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
private[graft] trait QueriesRelational { this: Queries.type =>
  // -------------------------------------------------------------- relational
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        round(sum(col("l_discount").cast("decimal(18,4)")).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  val aggPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  round(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def joinRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")

  val joinRevenueSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  def windowTop3(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderpriority", "rnk")
  }

  val windowTop3Sql: String =
    """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders
      |) WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin

  def sortTopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(100)

  val sortTopKSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin

  def setOps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      // EXCEPT has set semantics: output arrives deduplicated, no
      // explicit distinct needed on the left side
      .except(t(s, dir, "customer").where(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey")))
      .orderBy("custkey")

  val setOpsSql: String =
    """SELECT DISTINCT o_custkey AS custkey FROM orders
      |EXCEPT SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
      |ORDER BY custkey""".stripMargin

  def scalarFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .where(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"),
        dayofmonth(col("o_orderdate")).as("dom"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("pri1"),
        concat_ws("/", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        round(abs(col("o_totalprice") - 100000.0), 2).as("delta"),
        length(col("o_orderpriority")).as("prilen"))
      .orderBy("o_orderkey")

  val scalarFnsSql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS yr, month(o_orderdate) AS mth, day(o_orderdate) AS dom,
      |  upper(substring(o_orderpriority, 1, 1)) AS pri1,
      |  concat_ws('/', o_orderstatus, o_orderpriority) AS tag,
      |  round(abs(o_totalprice - 100000.0), 2) AS delta,
      |  length(o_orderpriority) AS prilen
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin

  def jsonEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("user_id"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double") / count(lit(1)), 6).as("avg_value"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonEventsSql: String =
    """SELECT event_type, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS n_users,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value,
      |  MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def rollupCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val rollupCountsSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS through the spark.sql entry point (rollup
    * and cube cover the shorthand forms in q08/q29; this is the general
    * form plus the SQL front door).
    */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    t(s, dir, "supplier")
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  val semiJoinSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_nationkey IN (
      |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA')
      |ORDER BY s_suppkey""".stripMargin

  def antiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(year(col("o_orderdate")) === 1995),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy("c_custkey")

  val antiJoinSql: String =
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
      |ORDER BY c_custkey""".stripMargin

  def cubeCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("yr").asc_nulls_first)

  val cubeCountsSql: String =
    """SELECT o_orderstatus, year(o_orderdate) AS yr, COUNT(*) AS cnt
      |FROM orders GROUP BY CUBE (o_orderstatus, year(o_orderdate))
      |ORDER BY o_orderstatus ASC NULLS FIRST, yr ASC NULLS FIRST""".stripMargin

  def intersectUnion(s: SparkSession, dir: String): DataFrame = {
    val buyers95 = t(s, dir, "orders").where(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("custkey")).distinct()
    val richCustomers = t(s, dir, "customer").where(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    val suppliers = t(s, dir, "supplier")
      .select((col("s_suppkey") + 1000000).as("custkey"))
    buyers95.intersect(richCustomers).union(suppliers).distinct().orderBy("custkey")
  }

  val intersectUnionSql: String =
    """SELECT custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
      |  INTERSECT
      |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      |  UNION
      |  SELECT s_suppkey + 1000000 AS custkey FROM supplier
      |) ORDER BY custkey""".stripMargin

  /** Exact order statistics: min/max/exact interpolated median. Both
    * engines use linear interpolation for the continuous percentile
    * (Spark `percentile`, DuckDB `quantile_cont`).
    */
  def orderStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  val orderStatsSql: String =
    """SELECT l_returnflag,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
