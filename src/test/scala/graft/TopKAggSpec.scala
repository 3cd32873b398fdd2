package graft

import graft.operators.TopKAgg
import org.apache.spark.sql.functions._

/** Native bounded top-k aggregate (q76's operator): equivalence with a
  * sort-based reference under randomization and repartitioning — the
  * merge path (partial buffers combining at the shuffle) is what the
  * partition variants exercise.
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  private def reference(
      rows: Seq[(String, Double, Long)], k: Int): Map[String, Seq[(Double, Long)]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3))
        .sortBy { case (v, id) => (-v, id) }.take(k)
    }

  test("randomized: matches the sort-based reference on any partitioning") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(2000)(i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(50).toDouble, i.toLong))
    val expected = reference(rows, 4)
    Seq(1, 13).foreach { parts =>
      val got = rows.toDF("g", "v", "id").repartition(parts)
        .groupBy("g")
        .agg(TopKAgg.topK(col("v"), col("id"), 4).as("top"))
        .as[(String, Seq[(Double, Long)])].collect().toMap
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("ties break by smaller id — deterministic across merges") {
    val rows = Seq(("g", 5.0, 30L), ("g", 5.0, 10L), ("g", 5.0, 20L), ("g", 1.0, 1L))
    val got = rows.toDF("g", "v", "id").repartition(3)
      .groupBy("g").agg(TopKAgg.topK(col("v"), col("id"), 3).as("top"))
      .as[(String, Seq[(Double, Long)])].head()._2
    assert(got == Seq((5.0, 10L), (5.0, 20L), (5.0, 30L)))
  }

  test("groups smaller than k return all rows; nulls are skipped") {
    val rows = Seq(("g", Some(2.0), Some(1L)), ("g", None, Some(2L)),
      ("g", Some(7.0), None), ("g", Some(3.0), Some(4L)))
    val got = rows.toDF("g", "v", "id")
      .groupBy("g").agg(TopKAgg.topK(col("v"), col("id"), 10).as("top"))
      .as[(String, Seq[(Double, Long)])].head()._2
    assert(got == Seq((3.0, 4L), (2.0, 1L)),
      "null value or null id rows must not participate")
  }

  test("NaN sorts largest (window-oracle parity), never wedges the buffer") {
    val rows = Seq(("g", 5.0, 1L), ("g", Double.NaN, 2L), ("g", 7.0, 3L),
      ("g", 9.0, 4L), ("g", 100.0, 5L))
    val got = rows.toDF("g", "v", "id").repartition(2)
      .groupBy("g").agg(TopKAgg.topK(col("v"), col("id"), 3).as("top"))
      .as[(String, Seq[(Double, Long)])].head()._2
    // Spark/DuckDB ORDER BY v DESC put NaN first; 100 and 9 follow —
    // the IEEE `>` buffer would have kept 5.0 and dropped 100.0
    assert(got.map(_._2) == Seq(2L, 5L, 4L))
    assert(got.head._1.isNaN)
  }

  test("integer value/id columns implicitly cast at plan time") {
    val rows = Seq((1, 10, 7), (1, 30, 8), (1, 20, 9))
    val got = rows.toDF("g", "v", "id")
      .groupBy("g").agg(TopKAgg.topK(col("v"), col("id"), 2).as("top"))
      .as[(Int, Seq[(Double, Long)])].head()._2
    assert(got == Seq((30.0, 8L), (20.0, 9L)),
      "int columns must cast, not ClassCastException mid-job")
  }

  test("k is a bounded plan-time literal") {
    intercept[IllegalArgumentException] {
      TopKAgg.topK(col("v"), col("id"), 0)
    }
    intercept[IllegalArgumentException] {
      TopKAgg.topK(col("v"), col("id"), 1025)
    }
  }
}
