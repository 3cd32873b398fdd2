package graft

import graft.operators.IntervalJoin

class IntervalCoalesceSpec extends SparkSuite {
  import spark.implicits._

  private def merge(rows: Seq[(Long, Long, Long, Long)], gap: Long = 0L) =
    IntervalJoin.coalesceIntervals(
      rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e", maxGap = gap)
      .orderBy("k", "start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("overlapping and touching intervals merge; gaps split") {
    val got = merge(Seq(
      (1L, 1L, 1L, 3L), (1L, 2L, 3L, 5L),   // touch at 3 → merge
      (1L, 3L, 7L, 9L),                      // gap of 1 → new span
      (2L, 4L, 0L, 10L)))
    assert(got == Seq((1L, 1L, 5L, 2L), (1L, 7L, 9L, 1L), (2L, 0L, 10L, 1L)))
  }

  test("nested interval does not split a long predecessor") {
    // [0,100] ⊃ [10,20]; [30,40] starts after 20 but is still inside
    // [0,100] — the EXCLUSIVE-PREFIX running max keeps one span
    val got = merge(Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 30L, 40L)))
    assert(got == Seq((1L, 0L, 100L, 3L)))
  }

  test("maxGap bridges adjacency; empty intervals are dropped") {
    val adj = merge(Seq((1L, 1L, 1L, 3L), (1L, 2L, 4L, 5L)), gap = 1L)
    assert(adj == Seq((1L, 1L, 5L, 2L)))
    val strict = merge(Seq((1L, 1L, 1L, 3L), (1L, 2L, 4L, 5L)))
    assert(strict == Seq((1L, 1L, 3L, 1L), (1L, 4L, 5L, 1L)))
    val withEmpty = merge(Seq((1L, 1L, 1L, 3L), (1L, 2L, 5L, 4L)))
    assert(withEmpty == Seq((1L, 1L, 3L, 1L)))
  }

  test("one shuffle: both windows and the span aggregation share it") {
    val df = Seq((1L, 1L, 1L, 3L), (1L, 2L, 2L, 5L)).toDF("k", "id", "s", "e")
    val plan = IntervalJoin.coalesceIntervals(df, "k", "id", "s", "e")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"expected the key shuffle (+ at most a partial-agg exchange):\n$plan")
  }

  test("coalesceIntervals rejects a negative maxGap") {
    val df = Seq((1L, 1L, 1L, 2L)).toDF("k", "id", "s", "e")
    intercept[IllegalArgumentException](
      IntervalJoin.coalesceIntervals(df, "k", "id", "s", "e", maxGap = -1L))
  }
}
