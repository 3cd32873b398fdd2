package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSuite {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame,
      checks: Seq[Quality.Check]): Seq[(String, Long, Long, Long, Boolean)] =
    Quality.run(df, checks).collect().toSeq.map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))

  test("row-local checks: counts, ppm and caller order") {
    val df = Seq(
      (Option(1L), Option(0.5), "A"), (Option(2L), Option(1.5), "B"),
      (Option(3L), Option(-0.1), "C"), (Option.empty[Long], Option(0.9), "A"))
      .toDF("id", "v", "tag")
    val got = report(df, Seq(
      Quality.InSet("tag", Seq("A", "B"), maxPpm = 250000L),
      Quality.NotNull("id"),
      Quality.InRange("v", 0.0, 1.0, maxPpm = 500000L)))
    assert(got == Seq(
      ("in_set(tag)", 1L, 4L, 250000L, true),     // exactly at threshold
      ("not_null(id)", 1L, 4L, 250000L, false),
      ("in_range(v)", 2L, 4L, 500000L, true)))
  }

  test("row-local checks fold into one scan of the source") {
    val df = spark.range(100).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS v")
    val plan = Quality.run(df, Seq(
      Quality.NotNull("id"), Quality.InRange("v", 0.0, 5.0),
      Quality.InSet("v", Seq("1.0", "2.0"))))
      .queryExecution.executedPlan.toString
    assert(plan.split("Range \\(").length - 1 == 1,
      s"expected exactly one scan of the source:\n$plan")
  }

  test("unique: violations are rows beyond the first per duplicated tuple") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "s")
    val got = report(df, Seq(Quality.Unique(Seq("k", "s"))))
    assert(got == Seq(("unique(k,s)", 2L, 5L, 400000L, false)))
  }

  test("ref integrity: orphans counted, nulls exempt") {
    val dim = Seq(10L, 20L).toDF("pk")
    val df = Seq(Option(10L), Option(10L), Option(20L), Option(99L),
      Option.empty[Long]).toDF("fk")
    val got = report(df, Seq(Quality.RefIntegrity("fk", dim, "pk")))
    // null fk is NotNull's business: total = 4 non-null, 1 orphan
    assert(got == Seq(("ref(fk)", 1L, 4L, 250000L, false)))
  }

  test("mixed check kinds keep caller order in the report") {
    val dim = Seq(1L).toDF("pk")
    val df = Seq((1L, 1L), (1L, 2L)).toDF("a", "b")
    val names = Quality.run(df, Seq(
      Quality.Unique(Seq("a")),
      Quality.NotNull("b"),
      Quality.RefIntegrity("b", dim, "pk"),
      Quality.InRange("a", 0, 10)))
      .select("check_name").as[String].collect().toSeq
    assert(names == Seq("unique(a)", "not_null(b)", "ref(b)", "in_range(a)"))
  }

  test("empty table passes every check") {
    val df = Seq.empty[(Option[Long], String)].toDF("id", "tag")
    val got = report(df, Seq(
      Quality.NotNull("id"), Quality.InSet("tag", Seq("A")),
      Quality.Unique(Seq("id"))))
    assert(got.forall { case (_, v, t, ppm, passed) =>
      v == 0L && t == 0L && ppm == 0L && passed })
  }

  test("run refuses an empty check list") {
    intercept[IllegalArgumentException](
      Quality.run(spark.range(1).toDF(), Seq.empty))
  }

  test("benfordScreen: digit counts, ppm shares, sub-1 values dropped") {
    val df = Seq(1.9, 1.0, 1.2, 1.5, 23.0, 23.7, 5.5, 999.0, 0.5, -3.0)
      .toDF("v")
    val got = Quality.benfordScreen(df, "v").orderBy("digit")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got.map(_._1) == (1 to 9), "all nine digits present")
    val byDigit = got.map(r => r._1 -> r).toMap
    assert(byDigit(1) == (1, 4L, 500000L, 301029L, 198971L))
    assert(byDigit(2) == (2, 2L, 250000L, 176091L, 73909L))
    assert(byDigit(5) == (5, 1L, 125000L, 79181L, 45819L))
    assert(byDigit(9) == (9, 1L, 125000L, 45757L, 79243L))
    assert(byDigit(3) == (3, 0L, 0L, 124938L, -124938L))
  }

  test("benfordScreen on empty input keeps nine zero rows") {
    val df = Seq.empty[Double].toDF("v")
    val got = Quality.benfordScreen(df, "v").orderBy("digit").collect()
    assert(got.length == 9)
    assert(got.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getLong(4) == -r.getLong(3)))
  }

  test("observed: CollectMetrics counters equal Quality.run, one scan") {
    val df = Seq((1.0, "click"), (5.0, "buy"), (2.0, "view"),
      (-1.0, "click")).toDF("value", "event_type")
    val checks: Seq[Quality.Check] = Seq(
      Quality.InRange("value", 0.0, 2.0, maxPpm = 500000L),
      Quality.InSet("event_type", Seq("click", "view")))
    val (instrumented, obs) = Quality.observed(df, checks)
    // metrics ride an ordinary action — here a count, in production
    // the output write
    assert(instrumented.count() == 4L)
    val m = obs.get
    assert(m("n_rows") == 4L, m.toString)
    assert(m("in_range(value)") == 2L, m.toString) // 5.0 and -1.0
    assert(m("in_set(event_type)") == 1L, m.toString) // "buy"
    // parity with the dedicated report operator
    val report = Quality.run(df, checks).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report("in_range(value)") == 2L &&
      report("in_set(event_type)") == 1L, report.toString)
  }

  test("arrivalHealth: dup ids, strict event-time regressions only") {
    // user 1 arrives (by id): ts 10, 5 (regression), 20, 20 (tie, NOT a
    // regression); ids 1,2,3,3 -> one duplicate id
    val e = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "a", 5L),
      (3L, 1L, "a", 20L), (3L, 1L, "a", 20L),
      (9L, 2L, "b", 7L)).toDF("event_id", "user_id", "event_type", "ts")
    val got = Quality.arrivalHealth(e, "event_type", "user_id",
        "event_id", "ts", "event_id")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // note the id-3 tie rows sort arbitrarily BETWEEN themselves, but
    // both carry ts 20 >= prevmax 10, so neither is out-of-order
    assert(got("a") == ((4L, 1L, 1L, 250000L)), got.toString)
    assert(got("b") == ((1L, 0L, 0L, 0L)), got.toString)
  }
}
