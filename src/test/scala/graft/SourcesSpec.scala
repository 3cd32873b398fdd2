package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet (SURVEY §3.2 scans/sinks
  * row): CSV, JSON-lines, and ORC round-trip the same testdata slice
  * losslessly with explicit schemas — the engine is not married to one
  * format on either side of a pipeline.
  */
class SourcesSpec extends SparkSuite {

  private def eventsSlice = Tables.table(spark, "/root/testdata/sf0.001", "events")
    .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    .where(col("event_id") <= 500)

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def roundTrip(format: String, writeOpts: Map[String, String],
      readOpts: Map[String, String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$format").toString
    val original = eventsSlice
    original.write.mode("overwrite").options(writeOpts).format(format).save(dir)
    val back = spark.read.options(readOpts).schema(schema).format(format).load(dir)
    val a = original.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"$format round-trip lost or mangled rows")
    assert(a.nonEmpty)
  }

  test("csv round-trips with explicit schema and header") {
    roundTrip("csv", Map("header" -> "true"), Map("header" -> "true"))
  }

  test("json-lines round-trips with explicit schema") {
    roundTrip("json", Map.empty, Map.empty)
  }

  test("orc round-trips") {
    roundTrip("orc", Map.empty, Map.empty)
  }

  test("csv reader parses typed columns, not strings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvt").toString
    eventsSlice.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.schema("value").dataType == DoubleType)
    assert(back.schema("event_id").dataType == LongType)
    val total = back.agg(sum(col("value"))).head.getDouble(0)
    val expected = eventsSlice.agg(sum(col("value"))).head.getDouble(0)
    assert(math.abs(total - expected) < 1e-6)
  }
}
