package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver testdata (TESTDATA.md).
  *
  * All inputs are parquet; Catalyst handles column pruning + predicate
  * pushdown at the scan, so every query should `select` early and let
  * the optimizer prune (`.explain` must show ReadSchema with only the
  * used columns).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The engine's event-time contract is INT64 UTC NANOSECONDS (what
    * every `ts div ...` bucket/sessionize/as-of expression and every
    * `epoch_ns(ts)`-based oracle is written against). Early testdata
    * generations stored exactly that (parquet TIMESTAMP(NANOS), read
    * as long under `nanosAsLong`); later generations store a
    * microsecond timestamp instead. Normalize the TYPE at the loader —
    * the values are identical instants — so both generations present
    * one schema to the 100+ registered queries. The conversion is
    * exact (micros × 1000 is far inside long range until year 2262)
    * and happens in the scan's own projection; with the session zone
    * pinned to UTC everywhere (Verify/Bench/specs), the NTZ→LTZ cast
    * is the identity on instants.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema.find(_.name == tsCol).map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn(tsCol,
          expr(s"unix_micros(cast($tsCol as timestamp)) * 1000L"))
      case _ => df
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
