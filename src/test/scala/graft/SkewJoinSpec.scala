package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Salted skew join: result equality with the plain join under planted
  * skew, and actual fan-out of the hot key across salt values.
  */
class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join under 90% single-key skew") {
    val probe = spark.range(2000).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
      col("id").as("v"))
    val build = spark.range(50).select(col("id").as("k"), (col("id") * 10).as("w"))
    val salted = SkewJoin.saltedInnerJoin(probe, build, Seq("k"), numSalts = 8)
      .select("k", "v", "w").as[(Long, Long, Long)].collect().sorted.toSeq
    val plain = probe.join(build, Seq("k"))
      .select("k", "v", "w").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == 7L) == 1800) // the hot key really is hot
  }

  test("hot key fans out across many salt values") {
    // replicate the operator's salt expression on the probe shape above
    val probe = spark.range(2000).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
      col("id").as("v"))
    val distinctSalts = probe
      .where(col("k") === 7L)
      .select(pmod(xxhash64(col("k"), col("v")), lit(8)).as("s"))
      .distinct().count()
    assert(distinctSalts == 8, s"hot key used only $distinctSalts of 8 salts")
  }

  test("duplicate keys on both sides multiply like the plain join") {
    val probe = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "pv")
    val build = Seq((1L, "x"), (1L, "y"), (3L, "z")).toDF("k", "bv")
    val salted = SkewJoin.saltedInnerJoin(probe, build, Seq("k"), numSalts = 4)
      .select("k", "pv", "bv").as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == Seq((1L, "a", "x"), (1L, "a", "y"), (1L, "b", "x"), (1L, "b", "y")))
  }
}
