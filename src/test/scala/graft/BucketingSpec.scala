package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located joins (SURVEY §3.2 "ours" / SCALING.md
  * broadcast-and-bucketing discipline): pre-bucketing both sides of a
  * recurring join on its key removes the per-query shuffle entirely —
  * THE standard amortization for fact-to-fact joins at 100 TB, where a
  * shuffle of either side is the dominant cost.
  */
class BucketingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("join of co-bucketed tables runs with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.table(spark, sf, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      Tables.table(spark, sf, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bkt")

      val o = spark.table("orders_bkt")
      val c = spark.table("customer_bkt")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))

      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"),
        s"co-bucketed join should shuffle NOTHING:\n$p")

      // and it computes the same thing as the shuffled join
      val expected = Tables.table(spark, sf, "orders")
        .join(Tables.table(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("bucketed aggregation on the bucket key skips the shuffle") {
    try {
      Tables.table(spark, sf, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .write.bucketBy(8, "o_custkey")
        .mode("overwrite").saveAsTable("orders_bkt2")
      val agg = spark.table("orders_bkt2")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"aggregation on the bucket key should not shuffle:\n$p")
      assert(agg.count() ==
        Tables.table(spark, sf, "orders").select("o_custkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt2")
    }
  }
}
