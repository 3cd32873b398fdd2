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

  test("allowExactMatches=false: an equal-ts right row is invisible") {
    val left = Seq((1L, 100L, 10L), (1L, 101L, 11L)).toDF("k", "t", "id")
    val right = Seq((1L, 100L, 1L), (1L, 90L, 2L)).toDF("k", "t", "id")
    val strict = AsOfJoin.latestAsOf(left, right, "k", "t", "id",
        allowExactMatches = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // at ts 100 the equal-ts quote must NOT match itself-in-time; the
    // 90 row does. At 101 the 100 row is strictly before and matches.
    assert(strict == Map(10L -> 2L, 11L -> 1L))
    val strictF = AsOfJoin.nextAsOf(left, right, "k", "t", "id",
        allowExactMatches = false)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(strictF == Map(10L -> None, 11L -> None))
  }

  test("nearestAsOf: closer side wins; backward wins exact-distance ties") {
    val left = Seq(
      (1L, 100L, 10L), // back at 97 (d=3), fwd at 105 (d=5) -> back
      (1L, 200L, 11L), // back at 190 (d=10), fwd at 205 (d=5) -> fwd
      (1L, 300L, 12L), // back at 295 (d=5), fwd at 305 (d=5) -> TIE -> back
      (2L, 50L, 13L)   // only a forward row
    ).toDF("k", "t", "id")
    val right = Seq(
      (1L, 97L, 1L), (1L, 105L, 2L), (1L, 190L, 3L), (1L, 205L, 4L),
      (1L, 295L, 5L), (1L, 305L, 6L), (2L, 60L, 7L)
    ).toDF("k", "t", "id")
    val got = AsOfJoin.nearestAsOf(left, right, "k", "t", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L, 11L -> 4L, 12L -> 5L, 13L -> 7L))
    // tolerance prunes both sides independently
    val tol = AsOfJoin.nearestAsOf(left, right, "k", "t", "id", tolerance = 4L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(tol == Map(10L -> Some(1L), 11L -> None, 12L -> None, 13L -> None))
  }

  test("nearestAsOf plans ONE key shuffle feeding both directional sorts") {
    // the design claim: both carries run over one tagged union — a
    // single hash exchange on k, two in-partition sorts, never a
    // self-join of two as-of outputs (which would shuffle twice and
    // join-shuffle a third time)
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "id")
    val right = Seq((1L, 97L, 1L)).toDF("k", "t", "id")
    val p = AsOfJoin.nearestAsOf(left, right, "k", "t", "id")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"nearest as-of must shuffle once on k:\n$p")
    assert(!p.contains("Join"), s"nearest as-of must not self-join:\n$p")
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
