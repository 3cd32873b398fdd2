package graft

import graft.operators.{IndexStore, TextAnalysis}
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object XProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.table(spark, dir, "documents")
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"XPROF $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val path = "/tmp/xprof_idx"
    time("save")(IndexStore.saveTextIndex(docs, "doc_id", "text", path))
    val idx = time("load")(IndexStore.loadTextIndex(spark, path))
    val queries = docs
      .where(pmod(col("doc_id"), lit(7)) === 3 && col("text").isNotNull)
      .select(col("doc_id").as("query_id"),
        array_join(slice(TextFunctions.tokens(col("text")), 1, 6), " ").as("qtext"))
    println("XPROF nqueries=" + queries.count())
    time("join-unpruned")(TextAnalysis.bm25TopKJoin(idx, queries, "query_id", "qtext", 5).count())
    time("join-pruned")(TextAnalysis.bm25TopKJoin(idx, queries, "query_id", "qtext", 5, maxScorePrune = true).count())
    time("join-pruned-2nd")(TextAnalysis.bm25TopKJoin(idx, queries, "query_id", "qtext", 5, maxScorePrune = true).count())
    spark.stop()
  }
}
