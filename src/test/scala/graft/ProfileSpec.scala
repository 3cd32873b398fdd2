package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

/** Column profiler: exact vs approximate agreement and error bounds. */
class ProfileSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")

  test("exact and approx profilers agree on everything but distinct counts") {
    val exact = Profile.summarize(Tables.table(spark, sf, "orders"), cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profile.summarizeApprox(Tables.table(spark, sf, "orders"), cols)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (name, e) =>
      val a = approx(name)
      assert(e.getAs[Long]("n_rows") == a.getAs[Long]("n_rows"), s"$name n_rows")
      assert(e.getAs[Long]("n_nulls") == a.getAs[Long]("n_nulls"), s"$name n_nulls")
      assert(e.getAs[String]("min_s") == a.getAs[String]("min_s"), s"$name min_s")
      assert(e.getAs[String]("max_s") == a.getAs[String]("max_s"), s"$name max_s")
      val ed = e.getAs[Long]("n_distinct").toDouble
      val ad = a.getAs[Long]("n_distinct_approx").toDouble
      // HLL++ at rsd=0.05: allow 3x the nominal relative standard deviation
      assert(math.abs(ad - ed) / ed <= 0.15,
        s"$name distinct: exact=$ed approx=$ad")
    }
  }

  test("keySkew: heavy keys, ppm shares and discrete percentiles are exact") {
    import spark.implicits._
    // counts: key 1 → 10 rows, key 2 → 5, keys 3..7 → 1 each
    val rows = Seq.fill(10)(1L) ++ Seq.fill(5)(2L) ++ (3L to 7L)
    val out = Profile.keySkew(rows.toDF("k"), "k", topK = 3)
      .orderBy("rank").collect()
    assert(out.length == 3)
    val top = out.map(r => (r.getAs[Long]("rank"), r.getAs[Long]("key"),
      r.getAs[Long]("cnt"), r.getAs[Long]("share_ppm")))
    assert(top.toSeq == Seq((1L, 1L, 10L, 500000L), (2L, 2L, 5L, 250000L),
      (3L, 3L, 1L, 50000L))) // cnt tie at 1 → smallest key wins rank 3
    val g = out.head
    assert(g.getAs[Long]("n_keys") == 7 && g.getAs[Long]("total_rows") == 20 &&
      g.getAs[Long]("max_cnt") == 10)
    // cum shares: cnt 1 covers 5/7 keys (≥50%) → p50=1; p90/p99 need
    // 6.3/6.93 keys → only the full 7 at cnt=10 reaches them
    assert(g.getAs[Long]("p50_cnt") == 1 && g.getAs[Long]("p90_cnt") == 10 &&
      g.getAs[Long]("p99_cnt") == 10)
  }

  test("keySkew plans the bounded TopKAgg, not a window over the key table") {
    import spark.implicits._
    val plan = Profile.keySkew(Seq(1L, 1L, 2L).toDF("k"), "k", topK = 2)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("graft_top_k"), "heavy keys must use the bounded aggregate")
    assert(!plan.contains("row_number"), s"unexpected window rank:\n$plan")
  }

  test("keySkew on empty input returns no rows") {
    import spark.implicits._
    assert(Profile.keySkew(Seq.empty[Long].toDF("k"), "k", topK = 5).isEmpty)
  }

  test("correlationMatrix: perfect, zero and inverse correlations") {
    import spark.implicits._
    // y = 2x (corr 1), z inverse of x (corr −1), w orthogonal (corr 0)
    val df = Seq(
      (1.0, 2.0, 3.0, 1.0), (2.0, 4.0, 2.0, 2.0),
      (1.0, 2.0, 3.0, 2.0), (2.0, 4.0, 2.0, 1.0))
      .toDF("x", "y", "z", "w")
    val got = Profile.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    def ppm(p: (String, String)) = got(p)._2.get
    assert(got.size == 6 && got.values.forall(_._1 == 4L))
    assert(math.abs(ppm(("x", "y")) - 1000000L) <= 1, "y = 2x")
    assert(math.abs(ppm(("x", "z")) + 1000000L) <= 1, "z inverse")
    assert(ppm(("x", "w")) == 0L, "w orthogonal")
  }

  test("correlationMatrix: pairwise deletion, constant column, empty input") {
    import spark.implicits._
    val df = Seq(
      (Option(1.0), Option(2.0), Option(5.0)),
      (Option(2.0), Option.empty[Double], Option(5.0)),
      (Option(3.0), Option(6.0), Option(5.0)))
      .toDF("x", "y", "c")
    val got = Profile.correlationMatrix(df, Seq("x", "y", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // (x,y): row 2 dropped pairwise → n=2, still perfectly linear
    assert(got(("x", "y"))._1 == 2L &&
      math.abs(got(("x", "y"))._2.get - 1000000L) <= 1)
    // constant column: no defined correlation
    assert(got(("x", "c")) == (3L, None) && got(("y", "c")) == (2L, None))
    val empty = Profile.correlationMatrix(
      Seq.empty[(Double, Double)].toDF("x", "y"), Seq("x", "y")).head()
    assert(empty.getLong(2) == 0L && empty.isNullAt(3))
  }

  test("drift: null/distinct/minmax movement vs hand computation") {
    import spark.implicits._
    val before = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("b")),
      (4L, None)).toDF("id", "s")
    val after = Seq((1L, Some("a")), (2L, Some("c")), (3L, None),
      (4L, None), (5L, None)).toDF("id", "s")
    val got = Profile.drift(before, after, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = got("s")
    assert(s.getLong(1) == 4L && s.getLong(2) == 5L) // n_rows a/b
    // nulls: 1/4 = 250000 ppm -> 3/5 = 600000 ppm
    assert(s.getLong(3) == 250000L && s.getLong(4) == 600000L &&
      s.getLong(5) == 350000L)
    // distinct (non-null values): {a,b}=2 -> {a,c}=2, ratio 1e6
    assert(s.getLong(6) == 2L && s.getLong(7) == 2L && s.getLong(8) == 1000000L)
    assert(!s.getBoolean(9)) // side_missing
    assert(!s.getBoolean(10) && s.getBoolean(11)) // min a=a; max b->c
    val id = got("id")
    assert(id.getLong(6) == 4L && id.getLong(7) == 5L &&
      id.getLong(8) == 1250000L)
    assert(id.getBoolean(11)) // max 4 -> 5
  }

  test("drift: an empty side is flagged, not dropped") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "s")
    val got = Profile.drift(a, a.limit(0), Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "s"))
    assert(got("id").getBoolean(9) && got("s").getBoolean(9))
    assert(got("id").getLong(2) == 0L) // n_rows_b zeroed
  }

  test("association: perfect dependence, independence, degenerate input") {
    import spark.implicits._
    // a determines b exactly: 2x2 diagonal
    val dep = Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"), ("a2", "b2"))
      .toDF("x", "y")
    val d = Profile.association(dep, "x", "y").head
    assert(d.getAs[Long]("n") == 4 && d.getAs[Long]("dof") == 1)
    // chi2 = (2-1)^2/1 * 2 + (0-1)^2/1 * 2 = 4; V = sqrt(4/(4*1)) = 1
    assert(d.getAs[Long]("chi2_e6") == 4000000L)
    assert(d.getAs[Long]("cramers_v_e6") == 1000000L)
    // MI = ln 2: two cells of floor(0.5 * ln 2 * 1e6)
    assert(d.getAs[Long]("mi_e6") ==
      2 * math.floor(0.5 * math.log(2.0) * 1000000.0).toLong)
    // exact independence: uniform 2x2 grid
    val ind = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2"))
      .toDF("x", "y")
    val i = Profile.association(ind, "x", "y").head
    assert(i.getAs[Long]("chi2_e6") == 0L && i.getAs[Long]("mi_e6") == 0L)
    assert(i.getAs[Long]("cramers_v_e6") == 0L)
    // single-category side: dof 0, V null
    val deg = Seq(("a1", "b1"), ("a1", "b2")).toDF("x", "y")
    val g = Profile.association(deg, "x", "y").head
    assert(g.getAs[Long]("dof") == 0 && g.isNullAt(g.fieldIndex("cramers_v_e6")))
  }

  test("concentration: equal split, full concentration, head shares") {
    import spark.implicits._
    val equal = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("k", "v")
    val e = Profile.concentration(equal, "k", "v", topPct = 25).head
    assert(e.getAs[Long]("gini_ppm") == 0L)
    assert(e.getAs[Long]("top1_ppm") == 250000L)
    assert(e.getAs[Long]("top25pct_ppm") == 250000L) // head = 1 key of 4
    // one key holds everything: G = (n-1)/n = 0.5 at n=2
    val conc = Seq(("a", 0L), ("b", 10L)).toDF("k", "v")
    val c = Profile.concentration(conc, "k", "v").head
    assert(c.getAs[Long]("gini_ppm") == 500000L)
    assert(c.getAs[Long]("top1_ppm") == 1000000L)
    // single key / zero total -> null gini, not division garbage
    val single = Profile.concentration(Seq(("a", 5L)).toDF("k", "v"), "k", "v").head
    assert(single.isNullAt(single.fieldIndex("gini_ppm")))
    val zero = Profile.concentration(Seq(("a", 0L), ("b", 0L)).toDF("k", "v"),
      "k", "v").head
    assert(zero.isNullAt(zero.fieldIndex("gini_ppm")) &&
      zero.isNullAt(zero.fieldIndex("top1_ppm")))
  }

  test("joinCardinality: product sums predict the join exactly") {
    import spark.implicits._
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")         // counts 3,1,1
    val b = Seq(1L, 1L, 2L, 2L, 2L, 9L).toDF("k")     // counts 2,3,(9:1)
    val got = Profile.joinCardinality(a, b, "k", "k", topK = 5)
      .orderBy("rank").collect()
    // matched keys 1,2: products 6 and 3; key 3 and 9 unmatched
    assert(got.length == 2)
    assert(got.map(r => (r.getAs[Long]("key"), r.getAs[Long]("pair_rows")))
      .toSeq == Seq((1L, 6L), (2L, 3L)))
    val actual = a.join(b, Seq("k")).count()
    assert(got.head.getAs[Long]("total_pair_rows") == actual,
      "predicted cardinality must equal the real join's row count")
    assert(got.head.getAs[Long]("n_matched_keys") == 2)
    assert(got.head.getAs[Long]("share_ppm") == 6L * 1000000 / 9)
  }

  test("correlationMatrix computes all pairs in one scan") {
    val df = spark.range(100).selectExpr("CAST(id AS DOUBLE) x",
      "CAST(id * 2 AS DOUBLE) y", "CAST(id % 7 AS DOUBLE) z")
    val plan = Profile.correlationMatrix(df, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Range \\(").length - 1 == 1,
      s"expected exactly one scan of the source:\n$plan")
  }

  test("entropyReport: uniform ln2, constant zero, nulls counted") {
    import spark.implicits._
    val df = Seq(("a", "k", Some("x")), ("a", "k", Some("x")),
      ("b", "k", None), ("b", "k", None))
      .toDF("u2", "const", "maybe")
    val got = Profile.entropyReport(df, Seq("u2", "const", "maybe"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // two values x2 each: H = ln 2 with the per-term floors:
    // (floor(4·ln4·1e6) − 2·floor(2·ln2·1e6)) div 4 = 693147
    assert(got("u2") == ((4L, 2L, 693147L)), got.toString)
    assert(got("const") == ((4L, 1L, 0L)), got.toString)
    // null is a value: maybe = {x:2, null:2} — same entropy as u2
    assert(got("maybe") == ((4L, 2L, 693147L)), got.toString)
  }
}
