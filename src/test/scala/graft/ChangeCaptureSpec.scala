package graft

import graft.operators.ChangeCapture
import org.apache.spark.sql.functions._

/** Snapshot CDC + SCD2 history: classification semantics, null-safety
  * of the payload signature, no-op collapse, and the one-shuffle plan
  * shape.
  */
class ChangeCaptureSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------- snapshotDiff
  private def oldSnap = Seq(
    (1L, Some("a"), 10),  // unchanged
    (2L, Some("b"), 20),  // update: payload changes
    (3L, Some("c"), 30),  // delete: absent from new
    (5L, None, 50),       // unchanged with a NULL payload column
    (6L, Some("f"), 60)   // update: value column changes
  ).toDF("id", "payload", "v")

  private def newSnap = Seq(
    (1L, Some("a"), 10),
    (2L, Some("B"), 20),
    (4L, Some("d"), 40),  // insert: absent from old
    (5L, None, 50),
    (6L, Some("f"), 61)
  ).toDF("id", "payload", "v")

  private def diff: Map[Long, String] =
    ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("id"), Seq("payload", "v"))
      .as[(Long, String)].collect().toMap

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    assert(diff == Map(2L -> "update", 3L -> "delete", 4L -> "insert",
      6L -> "update"))
  }

  test("snapshotDiff: null vs value is an update, null vs null is not") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "p")
    val n = Seq((1L, Some("y")), (2L, Option.empty[String])).toDF("id", "p")
    val d = ChangeCapture.snapshotDiff(o, n, Seq("id"), Seq("p"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "update", 2L -> "update"))
  }

  test("snapshotDiff: signature does not alias across column boundaries") {
    // ("ab","c") vs ("a","bc") — same concatenation without the ␁ joiner
    val o = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val n = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val d = ChangeCapture.snapshotDiff(o, n, Seq("id"), Seq("x", "y"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "update"))
    // (null, "x") vs ("", "x") — the ␂ null sentinel must not collide
    // with an empty string
    val o2 = Seq((1L, Option.empty[String], "x")).toDF("id", "a", "b")
    val n2 = Seq((1L, Some(""), "x")).toDF("id", "a", "b")
    val d2 = ChangeCapture.snapshotDiff(o2, n2, Seq("id"), Seq("a", "b"))
      .as[(Long, String)].collect().toMap
    assert(d2 == Map(1L -> "update"))
  }

  test("snapshotDiff joins signatures, not payloads") {
    // both join inputs must be pre-projected to keys + the md5
    // signature — the wide compare columns never reach the join
    val joinInputs = ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("id"),
        Seq("payload", "v"))
      .queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          j.children.flatMap(_.output.map(_.name))
      }
    assert(joinInputs.nonEmpty)
    joinInputs.foreach { names =>
      assert(!names.contains("payload") && !names.contains("v"),
        s"compare columns crossed into the join: $names")
    }
  }

  // --------------------------------------------------------------- scd2
  private def log = Seq(
    (1L, 10L, 100L, Some("bronze")),
    (1L, 20L, 101L, Some("bronze")), // no-op: collapsed
    (1L, 30L, 102L, Some("silver")),
    (1L, 30L, 103L, Some("gold")),   // same ts: tie broken by id
    (2L, 15L, 200L, Option.empty[String]), // null initial state kept
    (2L, 25L, 201L, Option.empty[String]), // null → null: no-op
    (2L, 35L, 202L, Some("bronze"))
  ).toDF("key", "ts", "id", "tier")

  private def hist: Set[(Long, Option[String], Long, Option[Long])] =
    ChangeCapture.scd2(log, Seq("key"), "ts", "id", Seq("tier"))
      .as[(Long, Option[String], Long, Option[Long])].collect().toSet

  test("scd2 collapses no-ops and chains validity intervals") {
    assert(hist == Set(
      (1L, Some("bronze"), 10L, Some(30L)),
      (1L, Some("silver"), 30L, Some(30L)),
      (1L, Some("gold"), 30L, None),
      (2L, None, 15L, Some(35L)),
      (2L, Some("bronze"), 35L, None)))
  }

  test("scd2 plans exactly one exchange for both window passes") {
    val plan = ChangeCapture.scd2(log, Seq("key"), "ts", "id", Seq("tier"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 key exchange, got $exchanges:\n$plan")
  }

  test("empty inputs yield empty diffs and histories") {
    val e = Seq.empty[(Long, String)].toDF("id", "p")
    assert(ChangeCapture.snapshotDiff(e, e, Seq("id"), Seq("p")).isEmpty)
    val el = Seq.empty[(Long, Long, Long, String)].toDF("key", "ts", "id", "tier")
    assert(ChangeCapture.scd2(el, Seq("key"), "ts", "id", Seq("tier")).isEmpty)
  }

  test("pointInTime: boundary inclusive at valid_from, exclusive at valid_to") {
    // key 1: bronze [10, 20), silver [20, null); key 2: gold [15, 25) GAP
    val dim = Seq(
      (1L, "bronze", 10L, Some(20L)), (1L, "silver", 20L, None),
      (2L, "gold", 15L, Some(25L)))
      .toDF("k", "tier", "valid_from", "valid_to")
    val facts = Seq(
      (100L, 1L, 9L),   // before first version -> null
      (101L, 1L, 10L),  // exactly valid_from -> bronze
      (102L, 1L, 19L),  // inside -> bronze
      (103L, 1L, 20L),  // boundary: silver starts AT 20
      (104L, 2L, 30L),  // after gold expired (gap) -> null
      (105L, 3L, 10L))  // key with no history -> null
      .toDF("fid", "k", "ts")
    val got = ChangeCapture.pointInTime(facts, dim, "k", "ts", Seq("tier"))
      .orderBy("fid")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("tier"))).toMap
    assert(got == Map(100L -> None, 101L -> Some("bronze"),
      102L -> Some("bronze"), 103L -> Some("silver"),
      104L -> None, 105L -> None), s"$got")
  }

  test("applyCdc: latest wins, ties by tie column, deletes, inserts, bad op raises") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    val changes = Seq(
      (1L, 10L, 1L, "U", "a2"),   // plain update
      (1L, 5L, 9L, "U", "old"),   // out-of-order: must lose to ts=10
      (2L, 10L, 1L, "U", "b2"),   // loses the tie below
      (2L, 10L, 2L, "D", null),   // same ts, higher tie: delete wins
      (5L, 10L, 1L, "U", "e"))    // brand-new key
      .toDF("id", "ts", "tie", "op", "v")
    val got = ChangeCapture.applyCdc(snap, changes, "id", "ts", "tie", "op",
        Seq("v"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a2"), (3L, "c"), (4L, "d"), (5L, "e")), s"$got")
    val bad = Seq((1L, 10L, 1L, "X", "zz")).toDF("id", "ts", "tie", "op", "v")
    val e = intercept[Exception] {
      ChangeCapture.applyCdc(snap, bad, "id", "ts", "tie", "op", Seq("v"))
        .collect()
    }
    assert(e.getMessage.contains("unknown op"), e.getMessage)
  }

  test("incrementalAggDelta + applyAggDelta == recompute (randomized)") {
    val rng = new scala.util.Random(11)
    val groups = Array("a", "b", "c", null)
    val base = (1L to 200L).map(k =>
      (k, groups(rng.nextInt(groups.length)), rng.nextInt(1000).toLong))
      .toDF("k", "grp", "v")
    // random log: multiple changes per key, inserts, deletes of
    // absent keys, out-of-order ts, ties
    val changes = (1 to 150).map { i =>
      val k = rng.nextInt(260).toLong + 1 // some keys beyond base (inserts/absent deletes)
      val op = if (rng.nextInt(4) == 0) "D" else "U"
      (k, rng.nextInt(5).toLong, i.toLong, op,
        if (op == "U") groups(rng.nextInt(groups.length)) else null,
        if (op == "U") rng.nextInt(1000).toLong else 0L)
    }.toDF("k", "ts", "tie", "op", "grp", "v")
    val baseAgg = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_val"))
    val delta = ChangeCapture.incrementalAggDelta(base, changes,
      "k", "ts", "tie", "op", "grp", "v")
    val got = ChangeCapture.applyAggDelta(baseAgg, delta, "grp")
      .as[(String, Long, Long)].collect()
      .map(r => Option(r._1) -> (r._2, r._3)).toMap
    val want = ChangeCapture.applyCdc(base, changes, "k", "ts", "tie",
        "op", Seq("grp", "v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .as[(String, Long, Long)].collect()
      .map(r => Option(r._1) -> (r._2, r._3)).toMap
    assert(got == want, s"delta-maintained != recompute\n$got\n$want")
  }

  test("incrementalAggDelta: empty log -> empty delta; applyAggDelta drops emptied groups") {
    val base = Seq((1L, "a", 5L), (2L, "a", 7L)).toDF("k", "grp", "v")
    val none = Seq.empty[(Long, Long, Long, String, String, Long)]
      .toDF("k", "ts", "tie", "op", "grp", "v")
    assert(ChangeCapture.incrementalAggDelta(base, none,
      "k", "ts", "tie", "op", "grp", "v").count() == 0L)
    // delete both rows of group a -> the group disappears entirely
    val delBoth = Seq((1L, 1L, 1L, "D", null.asInstanceOf[String], 0L),
        (2L, 1L, 1L, "D", null.asInstanceOf[String], 0L))
      .toDF("k", "ts", "tie", "op", "grp", "v")
    val baseAgg = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_val"))
    val delta = ChangeCapture.incrementalAggDelta(base, delBoth,
      "k", "ts", "tie", "op", "grp", "v")
    assert(ChangeCapture.applyAggDelta(baseAgg, delta, "grp").count() == 0L)
  }

  test("applyCdc is idempotent: replaying a delivered batch is a no-op") {
    // the exactly-once-sink property a foreachBatch retry relies on:
    // applying the same change batch twice must equal applying it once
    // (latest-wins picks the identical winner; upserts overwrite with
    // the same values; deletes stay deleted)
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val batch = Seq((1L, 10L, 1L, "U", "a2"), (2L, 10L, 1L, "D", null),
        (4L, 11L, 1L, "U", "d"))
      .toDF("id", "ts", "tie", "op", "v")
    val once = ChangeCapture.applyCdc(base, batch, "id", "ts", "tie",
      "op", Seq("v")).localCheckpoint(true)
    val twice = ChangeCapture.applyCdc(once, batch, "id", "ts", "tie",
      "op", Seq("v"))
    val a = once.as[(Long, String)].collect().toSeq.sortBy(_._1)
    val b = twice.as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(a == b, s"replay changed the snapshot: $a vs $b")
    assert(a == Seq((1L, "a2"), (3L, "c"), (4L, "d")), a.toString)
  }
}
