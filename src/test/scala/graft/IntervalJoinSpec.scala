package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Interval-overlap self-join (q73's operator): randomized equivalence
  * with driver-side brute force — including intervals LONGER than the
  * bucket (many shared buckets, so the credit-bucket dedup is what the
  * test exercises) — plus the edge geometry the predicate must get
  * exactly right.
  */
class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def brute(rows: Seq[(Int, Long, Long, Long)]): Set[(Int, Long, Long, Long)] = {
    val ok = rows.filter { case (_, _, s, e) => s <= e }
    (for {
      a <- ok; b <- ok
      if a._1 == b._1 && a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._2,
      math.min(a._4, b._4) - math.max(a._3, b._3) + 1)).toSet
  }

  test("randomized: matches brute force, intervals spanning many buckets") {
    val rnd = new scala.util.Random(42)
    // lengths up to 40 against bucketSize 8 → up to 6 shared buckets
    val rows = Seq.tabulate(300) { i =>
      (rnd.nextInt(5), i.toLong, rnd.nextInt(200).toLong,
        0L)
    }.map { case (k, id, s, _) => (k, id, s, s + rnd.nextInt(40)) }
    val got = IntervalJoin.selfOverlapPairs(
        rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e", bucketSize = 8)
      .select(col("k"), col("id_a"), col("id_b"), col("overlap"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got == brute(rows))
  }

  test("touching endpoints overlap by exactly 1; disjoint by 1 grain do not") {
    val rows = Seq(
      (1, 1L, 0L, 10L), (1, 2L, 10L, 20L), // share day 10
      (1, 3L, 21L, 30L))                   // starts the day after 2 ends
    val got = IntervalJoin.selfOverlapPairs(
        rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e", bucketSize = 64)
      .select(col("id_a"), col("id_b"), col("overlap"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("pairs never cross keys; empty intervals and empty input drop out") {
    val rows = Seq((1, 1L, 0L, 10L), (2, 2L, 0L, 10L), (1, 3L, 5L, 4L))
    val got = IntervalJoin.selfOverlapPairs(
      rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e", bucketSize = 4)
    assert(got.count() == 0)
    val empty = IntervalJoin.selfOverlapPairs(
      Seq.empty[(Int, Long, Long, Long)].toDF("k", "id", "s", "e"),
      "k", "id", "s", "e", bucketSize = 4)
    assert(empty.count() == 0)
  }

  test("overlapJoin (two tables): matches brute force, no id canonicalization") {
    val rnd = new scala.util.Random(9)
    def mk(n: Int, idBase: Long) = Seq.tabulate(n) { i =>
      val s = rnd.nextInt(120).toLong
      (rnd.nextInt(4), idBase + i, s, s + rnd.nextInt(25))
    }
    val lh = mk(120, 0L); val rh = mk(80, 1000L)
    val got = IntervalJoin.overlapJoin(
        lh.toDF("k", "id", "s", "e"), rh.toDF("k", "id", "s", "e"),
        "k", "id", "s", "e", bucketSize = 16)
      .select(col("k"), col("left_id"), col("right_id"), col("overlap"))
      .as[(Int, Long, Long, Long)].collect().toSet
    val expected = (for {
      a <- lh; b <- rh
      if a._1 == b._1 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._2,
      math.min(a._4, b._4) - math.max(a._3, b._3) + 1)).toSet
    assert(got == expected)
  }

  test("overlapJoin credit-bucket dedup: one row per cross pair at bucketSize 1") {
    // both intervals span 60 shared buckets — a broken credit filter
    // would emit the pair 60 times (a set compare could not see it)
    val lh = Seq((1, 1L, 0L, 59L)).toDF("k", "id", "s", "e")
    val rh = Seq((1, 2L, 10L, 70L)).toDF("k", "id", "s", "e")
    val rows = IntervalJoin.overlapJoin(lh, rh, "k", "id", "s", "e", bucketSize = 1)
      .collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("overlap") == 50L)
  }

  test("open-ended sentinel interval raises a pointed error, not an OOM") {
    val rows = Seq((1, 1L, 0L, Long.MaxValue), (1, 2L, 5L, 9L))
    val e = intercept[Exception] {
      IntervalJoin.selfOverlapPairs(
        rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e", bucketSize = 64)
        .collect()
    }
    assert(e.getMessage.contains("raise bucketSize"),
      s"expected the fan-out guard, got: ${e.getMessage}")
    // double-sentinel: the span subtraction overflows Long — the guard
    // must still fire (the wrap lands negative), not pass a garbage hi
    val wrap = Seq((1, 1L, Long.MinValue, Long.MaxValue), (1, 2L, 5L, 9L))
    val e2 = intercept[Exception] {
      IntervalJoin.selfOverlapPairs(
        wrap.toDF("k", "id", "s", "e"), "k", "id", "s", "e", bucketSize = 1)
        .collect()
    }
    assert(e2.getMessage.contains("raise bucketSize"),
      s"overflow must hit the guard, got: ${e2.getMessage}")
  }

  test("credit-bucket dedup: one row per pair even at bucketSize 1") {
    val rows = Seq((1, 1L, 0L, 99L), (1, 2L, 0L, 99L)) // 100 shared buckets
    val got = IntervalJoin.selfOverlapPairs(
        rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e", bucketSize = 1)
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("overlap") == 100L)
  }
}
