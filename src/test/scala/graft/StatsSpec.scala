package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Exact distributed regression (q72's operator): correctness on a
  * known line and the partitioning-independence that motivates the
  * DECIMAL-sum design.
  */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("recovers a perfect line exactly") {
    val df = (1 to 100).map(i => ("g", i.toDouble, 2.0 * i + 3.0))
      .toDF("g", "x", "y")
    val row = Stats.regression(df, Seq("g"), "x", "y").head()
    assert(row.getAs[Long]("n") == 100L)
    assert(row.getAs[Double]("slope") == 2.0)
    assert(row.getAs[Double]("intercept") == 3.0)
    // r is mathematically 1; the sqrt path may land one ulp under
    assert(row.getAs[Double]("r") >= 0.999999)
  }

  test("bit-identical under repartitioning — the built-in corr is not") {
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(5000) { i =>
      (s"g${i % 3}", (i % 97).toDouble + 0.25,
        3.5 * (i % 97) + rnd.nextInt(50).toDouble)
    }.toDF("g", "x", "y")
    val a = Stats.regression(df.repartition(1), Seq("g"), "x", "y")
      .orderBy("g").collect().toSeq
    val b = Stats.regression(df.repartition(13), Seq("g"), "x", "y")
      .orderBy("g").collect().toSeq
    assert(a == b, "decimal-sum regression must not depend on partitioning")
  }

  test("zero x-variance yields null slope, not a crash or Infinity") {
    val df = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0), ("g", 5.0, 9.0))
      .toDF("g", "x", "y")
    val row = Stats.regression(df, Seq("g"), "x", "y").head()
    assert(row.isNullAt(row.fieldIndex("slope")))
    assert(row.isNullAt(row.fieldIndex("r")))
  }

  test("zero variance detected exactly for non-binary-representable constants") {
    // 5.1094 is not a binary double; the double-computed n*sxx - sx²
    // lands at ±1e-13 (and can round NEGATIVE, making sqrt NaN) — the
    // min=max guard must null these out regardless
    val df = (1 to 11).map(i => ("g", 5.1094, i.toDouble)).toDF("g", "x", "y")
    val row = Stats.regression(df, Seq("g"), "x", "y").head()
    assert(row.isNullAt(row.fieldIndex("slope")),
      "rounded-variance noise must not fabricate a slope")
    assert(row.isNullAt(row.fieldIndex("r")), "r must be null, not NaN")
    // and the symmetric case: constant y only nulls r, not the slope
    val dfy = (1 to 11).map(i => ("g", i.toDouble, 5.1094)).toDF("g", "x", "y")
    val rowy = Stats.regression(dfy, Seq("g"), "x", "y").head()
    assert(!rowy.isNullAt(rowy.fieldIndex("slope")))
    assert(rowy.isNullAt(rowy.fieldIndex("r")))
  }
}
