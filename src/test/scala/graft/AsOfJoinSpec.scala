package graft

import graft.operators.AsOfJoin

/** As-of join semantics: inclusive match, no-prior-row null, equal-ts
  * tie-break to the highest right id, key isolation.
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("latest right row at or before each left ts, per key") {
    val left = Seq(
      (1L, 100L, 10L), // after right rows 1 and 2 -> id 2
      (1L, 50L, 11L),  // exactly at right row 1's ts -> inclusive -> 1
      (1L, 10L, 12L),  // before any right row -> null
      (2L, 100L, 13L)  // other key: only right row 3
    ).toDF("k", "t", "id")
    val right = Seq(
      (1L, 50L, 1L), (1L, 80L, 2L), (2L, 90L, 3L), (3L, 10L, 4L)
    ).toDF("k", "t", "id")
    val got = AsOfJoin.latestAsOf(left, right, "k", "t", "id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(10L -> Some(2L), 11L -> Some(1L), 12L -> None, 13L -> Some(3L)))
  }

  test("equal-ts right rows: highest id wins (deterministic)") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "id")
    val right = Seq((1L, 100L, 1L), (1L, 100L, 7L), (1L, 100L, 3L)).toDF("k", "t", "id")
    val got = AsOfJoin.latestAsOf(left, right, "k", "t", "id").head
    assert(got.getLong(1) == 7L)
  }

  test("tolerance: stale matches null out, in-window matches survive") {
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L)).toDF("k", "t", "id")
    val right = Seq((1L, 90L, 1L), (1L, 120L, 2L)).toDF("k", "t", "id")
    val got = AsOfJoin.latestAsOf(left, right, "k", "t", "id", tolerance = 20L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // 10: last right is 90, distance 10 <= 20 -> match; 11: last right
    // is 120, distance 80 > 20 -> null even though one EXISTS before
    assert(got == Map(10L -> Some(1L), 11L -> None))
  }

  test("nextAsOf: earliest at-or-after, lowest id at equal ts, tolerance") {
    val left = Seq(
      (1L, 100L, 10L), // next right at 100 (inclusive): ids 1,7,3 -> 1
      (1L, 150L, 11L), // next right at 300, distance 150 > 100 -> null
      (2L, 10L, 12L)   // no right row at all -> null
    ).toDF("k", "t", "id")
    val right = Seq(
      (1L, 100L, 1L), (1L, 100L, 7L), (1L, 100L, 3L), (1L, 300L, 5L)
    ).toDF("k", "t", "id")
    val got = AsOfJoin.nextAsOf(left, right, "k", "t", "id", tolerance = 100L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(10L -> Some(1L), 11L -> None, 12L -> None))
    // unbounded: the distant row matches
    val unb = AsOfJoin.nextAsOf(left, right, "k", "t", "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(unb(11L) == Some(5L))
  }
}
