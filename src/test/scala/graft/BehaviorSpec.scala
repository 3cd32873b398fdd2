package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSuite {
  import spark.implicits._

  private val steps = Seq(
    "a" -> (col("et") === "a"),
    "b" -> (col("et") === "b"),
    "c" -> (col("et") === "c"))

  test("funnel: strictly-after chaining, re-orderings don't count") {
    val ev = Seq(
      // u1 completes a→b→c
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // u2: b BEFORE a — never reaches step 2; a later c would need a b after a
      (2L, 5L, "b"), (2L, 10L, "a"), (2L, 30L, "c"),
      // u3: a then b at the SAME ts — strict > excludes it
      (3L, 10L, "a"), (3L, 10L, "b"),
      // u4: a,b but no c; second a earlier than b is the one that counts
      (4L, 50L, "a"), (4L, 40L, "a"), (4L, 45L, "b"))
      .toDF("u", "ts", "et")
    val got = Behavior.funnel(ev, "u", "ts", steps).orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // step1: u1,u2,u3,u4 = 4; step2: u1 (20>10), u4 (45>40) = 2; step3: u1
    assert(got == Seq(
      (1L, "a", 4L, 1000000L, 1000000L),
      (2L, "b", 2L, 500000L, 500000L),
      (3L, "c", 1L, 250000L, 500000L)))
  }

  test("funnel on empty input reports zero users and zero shares") {
    val ev = Seq.empty[(Long, Long, String)].toDF("u", "ts", "et")
    val got = Behavior.funnel(ev, "u", "ts", steps).orderBy("step")
      .select("users", "conv_ppm", "step_ppm").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((0L, 0L, 0L), (0L, 0L, 0L), (0L, 0L, 0L)))
  }

  test("retention: cohorting, offsets and ppm are exact") {
    val ev = Seq(
      // u1 first week 0, active weeks 0,1,2 (days 1, 8, 15)
      (1L, 1L), (1L, 8L), (1L, 15L),
      // u2 first week 0, active week 0 only (two events same week)
      (2L, 2L), (2L, 3L),
      // u3 first week 1, active weeks 1 and 3
      (3L, 7L), (3L, 25L))
      .toDF("u", "day")
    val got = Behavior.retention(ev, "u", "day", bucket = 7)
      .orderBy("cohort", "offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 2L, 1000000L),
      (0L, 1L, 1L, 2L, 500000L),
      (0L, 2L, 1L, 2L, 500000L),
      (1L, 0L, 1L, 1L, 1000000L),
      (1L, 2L, 1L, 1L, 1000000L)))
  }

  test("transitions: per-user lag with tie-break, row shares sum sanely") {
    val ev = Seq(
      (1L, 10L, 1L, "x"), (1L, 20L, 2L, "y"), (1L, 30L, 3L, "x"),
      // tie on ts broken by id: z(4) before x(5)
      (2L, 10L, 4L, "z"), (2L, 10L, 5L, "x"),
      (3L, 10L, 6L, "y")) // single event: no transition
      .toDF("u", "ts", "id", "et")
    val got = Behavior.transitions(ev, "u", "ts", "id", "et")
      .orderBy("src", "dst")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("x", "y", 1L, 1000000L),
      ("y", "x", 1L, 1000000L),
      ("z", "x", 1L, 1000000L)))
    // shares within one src split exactly
    val multi = Seq((1L, 1L, 1L, "s"), (1L, 2L, 2L, "p"), (1L, 3L, 3L, "s"),
      (1L, 4L, 4L, "q"), (1L, 5L, 5L, "s"), (1L, 6L, 6L, "q"))
      .toDF("u", "ts", "id", "et")
    val fromS = Behavior.transitions(multi, "u", "ts", "id", "et")
      .where(col("src") === "s").orderBy("dst")
      .as[(String, String, Long, Long)].collect().toSeq
    // s→p, s→q, s→q: wait — pairs are s→p, p→s, s→q, q→s, s→q
    assert(fromS == Seq(("s", "p", 1L, 333333L), ("s", "q", 2L, 666666L)))
  }

  test("pathNgrams: sliding runs stay within one user, tie-broken ranks") {
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"), (1L, 4L, 4L, "b"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "b"), (2L, 3L, 7L, "c"),
      (3L, 1L, 8L, "z")) // too short for any trigram
      .toDF("u", "ts", "id", "et")
    val got = Behavior.pathNgrams(ev, "u", "ts", "id", "et", n = 3, topK = 2)
      .as[(String, Long)].collect().toSeq
    // u1 contributes a>b>c and b>c>b; u2 contributes a>b>c
    assert(got == Seq(("a>b>c", 2L), ("b>c>b", 1L)))
  }

  test("pathNgrams: ranking input is the collapsed path table, window is keyed") {
    val ev = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"))
      .toDF("u", "ts", "id", "et")
    // topK=1: a limit above the inferable row bound would be optimized away
    val plan = Behavior.pathNgrams(ev, "u", "ts", "id", "et", 2, 1)
      .queryExecution.optimizedPlan.toString
    // the sort's child must be the aggregate (path grain), never raw events
    assert(plan.matches("(?s)GlobalLimit.*Sort.*Aggregate.*Window.*"),
      s"expected limit over sort over the path aggregate:\n$plan")
    // the LEAD window must be user-partitioned, not global
    assert(plan.contains("windowspecdefinition(u#"),
      s"expected a user-partitioned window:\n$plan")
  }

  test("attribution: first/last/linear models match hand computation") {
    val ev = Seq(
      // u1: view -> click -> purchase(10.00); signup AFTER doesn't count
      (1L, 10L, 10L, "view", 0.0), (1L, 20L, 11L, "click", 0.0),
      (1L, 25L, 12L, "purchase", 10.0), (1L, 26L, 13L, "signup", 0.0),
      // u2: untouched purchase(5.55)
      (2L, 50L, 20L, "purchase", 5.55),
      // u3: view view click -> purchase(1.01): linear 67/33, residue 1
      (3L, 10L, 30L, "view", 0.0), (3L, 11L, 31L, "view", 0.0),
      (3L, 12L, 32L, "click", 0.0), (3L, 100L, 33L, "purchase", 1.01),
      // u4: tie timestamps -> event id breaks first/last
      (4L, 5L, 40L, "view", 0.0), (4L, 5L, 41L, "click", 0.0),
      (4L, 6L, 42L, "purchase", 100.0)
    ).toDF("u", "ts", "id", "et", "value")
    val got = Behavior.attribution(ev, "u", "ts", "id", "et", "value",
        "purchase", Seq("view", "click", "signup"), lookback = 100L)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("view") == ("view", 3L, 11101L, 0L, 0L, 4L, 5567L))
    assert(got("click") == ("click", 0L, 0L, 3L, 11101L, 3L, 5533L))
    assert(got("(none)") == ("(none)", 1L, 555L, 1L, 555L, 0L, 555L))
    assert(!got.contains("signup"), "post-conversion touch must not attribute")
  }

  test("conversionLatency: first-to-first, ordering rule, non-converters drop") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 15L, "view"), (1L, 40L, "purchase"),
      (1L, 50L, "purchase"),                      // first->first: 40-10
      (2L, 30L, "purchase"), (2L, 35L, "view"),   // converted BEFORE touch
      (3L, 10L, "view"),                          // never converted
      (4L, 20L, "purchase"))                      // never touched
      .toDF("u", "ts", "et")
    val got = Behavior.conversionLatency(ev, "u", "ts",
        col("et") === "view", col("et") === "purchase")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 30L), s"$got")
  }

  test("attribution: empty input yields only a zero (none) row") {
    val ev = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("u", "ts", "id", "et", "value")
    val got = Behavior.attribution(ev, "u", "ts", "id", "et", "value",
        "purchase", Seq("view"), lookback = 100L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("(none)", 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("transitions: no shuffle between the user sort and the matrix") {
    val ev = Seq((1L, 10L, 1L, "x"), (1L, 20L, 2L, "y")).toDF("u", "ts", "id", "et")
    val plan = Behavior.transitions(ev, "u", "ts", "id", "et")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // one exchange for the per-user window, one for the (src,dst) matrix,
    // one for the per-src share — the last two are aggregate-grain
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).size
    assert(exchanges <= 3, s"too many shuffles ($exchanges):\n$plan")
  }

  test("kaplanMeier: hand-computed risk sets, censoring, cumulative product") {
    // subjects: two events at t=1, one censored at t=1, one event at
    // t=2, one censored at t=3 (no step: d=0 there)
    val df = Seq((1L, 1), (1L, 1), (1L, 0), (2L, 1), (3L, 0))
      .toDF("dur", "e")
    val got = Behavior.kaplanMeier(df, "dur", "e")
      .orderBy("t")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 2L, 1L, 600000L, 600000L),  // S(1) = 3/5
      (2L, 2L, 1L, 0L, 500000L, 300000L)), // S(2) = 3/5 * 1/2
      s"$got")
    // invalid event flag raises; empty input yields an empty curve
    val e = intercept[Exception] {
      Behavior.kaplanMeier(Seq((1L, 2)).toDF("dur", "e"), "dur", "e")
        .collect()
    }
    assert(e.getMessage.contains("0 (censored) or 1"), e.getMessage)
    assert(Behavior.kaplanMeier(df.limit(0), "dur", "e").count() == 0)
  }

  test("quotaAdmit: first-N by (ts, tie) per window; windows reset the count") {
    val day = 100L
    val ev = Seq(
      (1L, 10L, 1L), (2L, 10L, 2L), (3L, 20L, 3L),   // u1 day0: 3 events
      (4L, 110L, 4L),                                 // u1 day1: resets
      (5L, 15L, 5L))                                  // u2 day0
      .map { case (id, ts, tie) => (id, if (id == 5L) 2L else 1L, ts, tie) }
      .toDF("eid", "u", "ts", "tie")
    val got = Behavior.quotaAdmit(ev, "u", "ts", "tie", day, quota = 2)
      .select("eid", "win", "seq", "admitted")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 0L, 1L, true), (2L, 0L, 2L, true), (3L, 0L, 3L, false),
      (4L, 1L, 1L, true), (5L, 0L, 1L, true)), s"$got")
  }

  test("markovAttribution: hand-computed chain, removal effects, shares") {
    // u1: click -> view -> purchase; u2: click -> (no conversion)
    // exact absorption: P(view)=1, P(click)=1/2, P(START)=1/2
    // removing click or view each kills ALL conversion -> equal shares
    val ev = Seq(
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "view"), (1L, 30L, 3L, "purchase"),
      (1L, 40L, 4L, "view"), // post-conversion noise: must be ignored
      (2L, 10L, 5L, "click"))
      .toDF("u", "ts", "id", "et")
    val got = Behavior.markovAttribution(ev, "u", "ts", "id", "et", "purchase")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val s = 1000000000000L
    assert(got == Seq(
      ("click", s / 2, 0L, 1000000L, 500000L),
      ("view", s / 2, 0L, 1000000L, 500000L)), s"$got")
  }

  test("markovAttribution: non-removable conversion share; empty input") {
    // single converting user, one channel: that channel takes all credit
    val ev = Seq((1L, 1L, 1L, "ads"), (1L, 2L, 2L, "purchase"))
      .toDF("u", "ts", "id", "et")
    val got = Behavior.markovAttribution(ev, "u", "ts", "id", "et", "purchase")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val s = 1000000000000L
    assert(got == Seq(("ads", s, 0L, 1000000L, 1000000L)), s"$got")
    assert(Behavior.markovAttribution(ev.limit(0), "u", "ts", "id", "et",
      "purchase").count() == 0)
  }

  test("clampedBalance: Lindley closed form equals the sequential fold") {
    // deltas -5, +3, -1, +10: recursion b = 0, 3, 2, 12; one floor hit
    val e1 = Seq(("k", 1L, 1L, -5L), ("k", 2L, 2L, 3L),
      ("k", 3L, 3L, -1L), ("k", 4L, 4L, 10L))
      .toDF("u", "t", "id", "d")
    val r1 = Behavior.clampedBalance(e1, "u", "t", "id", "d").head()
    assert(r1.getAs[Long]("end_balance") == 12L, r1.toString)
    assert(r1.getAs[Long]("peak_balance") == 12L, r1.toString)
    assert(r1.getAs[Long]("n_floor_events") == 1L, r1.toString)
    // repeated clamping: -5 then -4 both floor; end 0
    val e2 = Seq(("k", 1L, 1L, -5L), ("k", 2L, 2L, -4L))
      .toDF("u", "t", "id", "d")
    val r2 = Behavior.clampedBalance(e2, "u", "t", "id", "d").head()
    assert(r2.getAs[Long]("end_balance") == 0L &&
      r2.getAs[Long]("n_floor_events") == 2L, r2.toString)
    // randomized: closed form equals a driver-side sequential fold
    val rnd = new scala.util.Random(42)
    val ds = (1 to 200).map(i => ("k", i.toLong, i.toLong,
      (rnd.nextInt(21) - 10).toLong))
    val want = ds.map(_._4).scanLeft(0L)((b, d) => math.max(0L, b + d))
    val r3 = Behavior.clampedBalance(ds.toDF("u", "t", "id", "d"),
      "u", "t", "id", "d").head()
    assert(r3.getAs[Long]("end_balance") == want.last, r3.toString)
    assert(r3.getAs[Long]("peak_balance") == want.max, r3.toString)
  }
}
