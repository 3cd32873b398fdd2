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

  test("outliers: flags exactly the rows a local z-score computation flags") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.tabulate(500)(i =>
      (i.toLong, s"g${i % 2}", math.floor(rnd.nextGaussian() * 1e4) / 1e4)) ++
      Seq((9001L, "g0", 50.0), (9002L, "g1", -40.0)) // planted spikes
    val got = Stats.outliers(vals.toDF("id", "g", "v"), Seq("g"), "v", k = 3.0)
      .select("id").as[Long].collect().toSet
    val expected = vals.groupBy(_._2).flatMap { case (_, rows) =>
      val n = rows.size.toDouble
      val sx = rows.map(_._3).sum
      val sxx = rows.map(r => r._3 * r._3).sum
      rows.filter { r =>
        math.abs((n * r._3 - sx) / math.sqrt(n * sxx - sx * sx)) > 3.0
      }.map(_._1)
    }.toSet
    // 4-decimal inputs: the decimal truncation is the identity, so the
    // local double computation is only ulp-apart from the operator's —
    // the planted spikes (|z| >> 3) must be found and agreement must be
    // exact away from the threshold
    assert(got.contains(9001L) && got.contains(9002L))
    assert((got -- expected).isEmpty && (expected -- got).isEmpty,
      s"disagree: spark-only=${got -- expected} local-only=${expected -- got}")
  }

  test("outliers: near-constant groups (variance rounds to <= 0) yield no flags") {
    // exact decimal sums, but the DOUBLE n·Σx² − (Σx)² cancels
    // catastrophically at 1e9 magnitude: the first group rounds to
    // -2048 (sqrt → NaN — under Spark's NaN-is-largest ordering every
    // row would flag without the varN > 0 guard), the second to
    // exactly 0 (z → ±Inf, same failure)
    val nanGroup = Seq(999999999.9001, 999999999.9003, 999999999.9, 999999999.9001)
    val infGroup = Seq(9999999999.0002, 9999999999.0003, 9999999999.0001, 9999999999.0002)
    val df = (nanGroup.map(("nan", _)) ++ infGroup.map(("inf", _)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    assert(Stats.outliers(df, Seq("g"), "v", k = 0.0001).count() == 0,
      "degenerate variance must suppress flags, not flag everything")
  }

  test("outliers: values outside the decimal(14,4) domain raise loudly") {
    val df = Seq((1L, "g", 1.0), (2L, "g", 5e10), (3L, "g", 2.0))
      .toDF("id", "g", "v")
    val e = intercept[Exception] {
      Stats.outliers(df, Seq("g"), "v").collect()
    }
    assert(e.getMessage.contains("decimal(14,4)"),
      s"expected the overflow guard, got: ${e.getMessage}")
  }

  test("outliers: NULL group keys form a group whose extremes still flag") {
    val df = (Seq.tabulate(50)(i => (i.toLong, None: Option[String], 1.0 + i * 0.001)) :+
      ((999L, None: Option[String], 500.0))) ++ Seq((1000L, Some("g"), 1.0), (1001L, Some("g"), 2.0))
    val got = Stats.outliers(df.toDF("id", "g", "v"), Seq("g"), "v", k = 3.0)
      .select("id").as[Long].collect().toSet
    assert(got.contains(999L),
      "the null-keyed group's spike must be flagged (null-safe join)")
  }

  test("robustOutliers: flags the spike a dragged mean/sigma would soften") {
    // 3 extreme values drag sigma so hard that the z-score detector's
    // threshold inflates; the median/MAD detector still flags exactly
    // the extremes and nothing else
    val body = Seq.tabulate(200)(i => (i.toLong, "g", 10.0 + (i % 9) * 0.25))
    val spikes = Seq((900L, "g", 500.0), (901L, "g", 520.0), (902L, "g", -480.0))
    val df = (body ++ spikes).toDF("id", "g", "v")
    val robust = Stats.robustOutliers(df, Seq("g"), "v", k = 3.0)
      .select("id").as[Long].collect().toSet
    assert(robust == Set(900L, 901L, 902L), s"got $robust")
    // determinism: identical flags on a different partitioning
    val again = Stats.robustOutliers(df.repartition(7), Seq("g"), "v", k = 3.0)
      .select("id").as[Long].collect().toSet
    assert(again == robust)
  }

  test("robustOutliers: sub-precision input raises (engines round differently)") {
    // 1.235 at decimals=2: Spark's decimal->long cast would truncate
    // to 123 where DuckDB rounds to 124 — the contract guard must
    // refuse rather than let the two engines diverge silently
    val df = Seq((1L, "g", 1.23), (2L, "g", 1.235), (3L, "g", 9.0))
      .toDF("id", "g", "v")
    val e = intercept[Exception] {
      Stats.robustOutliers(df, Seq("g"), "v", decimals = 2).collect()
    }
    assert(e.getMessage.contains("fixed-point"),
      s"expected the precision guard, got: ${e.getMessage}")
    // the same data IS fixed-point at decimals=3 — no raise
    assert(Stats.robustOutliers(df, Seq("g"), "v", decimals = 3).count() >= 0)
  }

  test("robustOutliers: a 5th decimal place raises even at decimals=4") {
    // regression guard for the ADVICE r4 hole: the old check cast to
    // decimal(14,4) FIRST, so at decimals=4 the 5th place was rounded
    // away before the integrality test and sub-precision input passed
    // silently (with engine-dependent rounding). The check now runs on
    // a decimal(18,8) image of the raw double.
    val df = Seq((1L, "g", 1.0), (2L, "g", 1.00005), (3L, "g", 9.0))
      .toDF("id", "g", "v")
    val e = intercept[Exception] {
      Stats.robustOutliers(df, Seq("g"), "v", decimals = 4).collect()
    }
    assert(e.getMessage.contains("fixed-point"),
      s"expected the precision guard, got: ${e.getMessage}")
  }

  test("robustOutliers: MAD = 0 (majority at the median) yields no flags") {
    val df = (Seq.fill(20)(5.0) ++ Seq(9.0, 1.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "v")
    assert(Stats.robustOutliers(df, Seq("g"), "v", k = 0.5).count() == 0,
      "zero MAD must suppress flags, not divide by zero")
  }

  test("outliers: empty groupCols = global (whole-table) detection") {
    val df = (Seq.tabulate(100)(i => (i.toLong, 1.0 + (i % 7) * 0.1)) :+
      ((999L, 50.0))).toDF("id", "v")
    val got = Stats.outliers(df, Seq.empty, "v", k = 3.0)
      .select("id").as[Long].collect().toSet
    assert(got == Set(999L), s"got $got")
    assert(Stats.robustOutliers(df, Seq.empty, "v", decimals = 1)
      .select("id").as[Long].collect().toSet == Set(999L))
  }

  test("equiDepthBins matches a driver-side cume_dist reference; edges behave") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(400)(i =>
      (i.toLong, s"g${i % 3}", math.floor(rnd.nextGaussian() * 100) / 100))
    val data = rows.map { case (id, g, v) => (id, g, Option(v)) } ++
      Seq((900L, "g0", Option.empty[Double]), // null value
        (901L, "gc", Option(7.0)), (902L, "gc", Option(7.0))) // constant group
    val df = data.toDF("id", "g", "v")
    val got = Stats.equiDepthBins(df, Seq("g"), "v", nBins = 4)
      .select("id", "bin").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    // driver-side reference: boundary b = min v with cume_dist >= b/4,
    // bin = count of boundaries strictly below v
    val byG = data.filter(_._3.isDefined).groupBy(_._2)
    val want = byG.flatMap { case (_, rs) =>
      val vs = rs.map(_._3.get).sorted
      val n = vs.size.toDouble
      def bound(p: Double) = vs.find(v => vs.count(_ <= v) / n >= p).get
      val qs = (1 until 4).map(b => bound(b / 4.0))
      rs.map(r => r._1 -> Some(qs.count(_ < r._3.get)))
    }
    want.foreach { case (id, w) => assert(got(id) == w, s"id $id: ${got(id)} vs $w") }
    assert(got(900L).isEmpty, "null value -> null bin")
    // constant group: all boundaries equal the value -> everything bin 0
    assert(got(901L) == Some(0) && got(902L) == Some(0))
    // row count preserved (no group silently dropped)
    assert(Stats.equiDepthBins(df, Seq("g"), "v", 4).count() == df.count())
    // partitioning-independence (boundaries are data values, not floats)
    val again = Stats.equiDepthBins(df.repartition(7), Seq("g"), "v", 4)
      .select("id", "bin").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(again == got)
  }

  test("normalize: z agrees with the outlier flags; minmax bounded; constants null") {
    val df = (Seq.tabulate(50)(i => (i.toLong, "g", 1.0 + (i % 10) * 0.5)) :+
      ((99L, "g", 42.0))) ++ Seq((200L, "c", 7.0), (201L, "c", 7.0))
    val norm = Stats.normalize(df.toDF("id", "g", "v"), Seq("g"), "v")
    val byId = norm.collect().map(r => r.getLong(0) -> r).toMap
    // the spike's z must exceed 3 and match the outlier detector's z
    val flagged = Stats.outliers(df.toDF("id", "g", "v"), Seq("g"), "v", 3.0)
      .select("id", "z").as[(Long, Double)].collect().toMap
    assert(flagged.keySet == Set(99L))
    assert(byId(99L).getAs[Double]("z") == flagged(99L))
    // minmax: extremes hit exactly 0 and 1, everything in between
    val mms = norm.where(col("g") === "g").select("minmax").as[Double].collect()
    assert(mms.min == 0.0 && mms.max == 1.0 && mms.forall(m => m >= 0 && m <= 1))
    // constant group: both columns null, rows preserved
    assert(byId(200L).isNullAt(byId(200L).fieldIndex("z")))
    assert(byId(201L).isNullAt(byId(201L).fieldIndex("minmax")))
  }

  test("decayedSum: half-life shifts, floor semantics, null drops") {
    // anchor = day 100; half-life 7
    val rows = Seq(
      (1L, 100L, Some(1.5)),     // same-day: no decay
      (1L, 100L, Some(2.25)),
      (1L, 93L, Some(1.0)),      // age 7  → 1 shift
      (1L, 92L, Some(1.0)),      // age 8  → still 1 shift (quantized)
      (2L, 79L, Some(0.5)),      // age 21 → 3 shifts: 5000/8 = 625
      (2L, 100L, Some(-0.5)),    // negative value, no decay
      (3L, 0L, Some(1.0)),       // age 100 → 14 shifts: 10000/16384 → 0
      (3L, 100L, None),          // null value: dropped entirely
      (4L, 93L, Some(-2.4375))   // -24375/2 floors to -12188, not -12187
    ).toDF("k", "day", "v")
    val got = Stats.decayedSum(rows, "k", "day", "v", halfLifeDays = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 37500L + 5000L + 5000L, 4L),
      (2L, 625L - 5000L, 2L),
      (3L, 0L, 1L),
      (4L, -12188L, 1L)))
  }

  test("decayedSum: shift cap at 62 and empty input") {
    val far = Seq((1L, 0L, Some(1e9)), (1L, 1000000L, Some(0.0)))
      .toDF("k", "day", "v")
    // age 1e6 days → d would be ~142857, capped at 62: 1e13 >> 62 = 0
    val got = Stats.decayedSum(far, "k", "day", "v", halfLifeDays = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 2L)))
    assert(Stats.decayedSum(far.limit(0), "k", "day", "v", 7).isEmpty)
  }

  test("cusumShift: closed form equals the textbook fold, both directions") {
    // two keys, deliberate level shift in "a"'s second half
    val series = Map(
      "a" -> Seq(5L, 4L, 5L, 6L, 5L, 9L, 10L, 9L, 11L, 10L),
      "b" -> Seq(7L, 7L, 8L, 6L, 7L, 7L, 8L, 6L, 7L, 7L))
    val df = series.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (x, i) => (k, i.toLong, x) }
    }.toDF("k", "t", "x")
    val slack = 1L
    val got = Stats.cusumShift(df, "k", "t", "x", slack, threshold = 3)
      .orderBy("k", "t")
      .as[(String, Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect()
    series.foreach { case (k, xs) =>
      val target = xs.sum / xs.length // floor mean, same div semantics
      // textbook recursion S_i = max(0, S_{i-1} + d_i)
      val up = xs.scanLeft(0L)((s, x) => math.max(0L, s + (x - target - slack))).tail
      val dn = xs.scanLeft(0L)((s, x) => math.max(0L, s + (target - x - slack))).tail
      val rows = got.filter(_._1 == k).sortBy(_._2)
      assert(rows.map(_._4).distinct.toSeq == Seq(target))
      assert(rows.map(_._5).toSeq == up, s"cusum_up mismatch for $k")
      assert(rows.map(_._6).toSeq == dn, s"cusum_dn mismatch for $k")
      assert(rows.map(_._7).toSeq == up.map(_ > 3))
      assert(rows.map(_._8).toSeq == dn.map(_ > 3))
    }
    // the planted shift in "a" must be flagged; steady "b" must not be
    assert(got.exists(r => r._1 == "a" && r._7))
    assert(!got.exists(r => r._1 == "b" && (r._7 || r._8)))
  }

  test("psi: identical snapshots score ~0; a planted shift scores high") {
    val a = (Seq.fill(50)(10.0) ++ Seq.fill(50)(110.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val same = Stats.psi(a, a, "v", binWidth = 100L, maxBin = 4)
      .orderBy("bin").collect()
    assert(same.length == 5)
    assert(same.forall(_.getAs[Long]("term_e6") == 0L),
      "identical distributions must have zero PSI in every bin")
    assert(same.head.getAs[Long]("psi_total_e6") == 0L)
    // all mass moves from bin 0/1 to bin 4
    val b = a.withColumn("v", lit(450.0))
    val shifted = Stats.psi(a, b, "v", binWidth = 100L, maxBin = 4)
    val total = shifted.head.getAs[Long]("psi_total_e6")
    assert(total > 250000L, s"full shift must exceed the 0.25 alarm, got $total")
  }

  test("psi: hand-replayed smoothing and floor terms; nulls drop") {
    val a = Seq(Some(0.0), Some(0.0), Some(150.0), None).toDF("v")
    val b = Seq(Some(0.0), Some(150.0), Some(150.0)).toDF("v")
    val got = Stats.psi(a, b, "v", binWidth = 100L, maxBin = 1)
      .orderBy("bin").collect()
    // counts: a = (2,1) of 3; b = (1,2) of 3; smoothed over N+2=5
    val sa = Seq((2L + 1) * 1000000 / 5, (1L + 1) * 1000000 / 5)
    val sb = Seq((1L + 1) * 1000000 / 5, (2L + 1) * 1000000 / 5)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_a") == (if (i == 0) 2L else 1L))
      assert(r.getAs[Long]("share_a_ppm") == sa(i))
      assert(r.getAs[Long]("share_b_ppm") == sb(i))
      val expect = math.floor(
        (sa(i) - sb(i)) * math.log(sa(i).toDouble / sb(i))).toLong
      assert(r.getAs[Long]("term_e6") == expect, s"bin $i")
    }
  }

  test("imputeMedian: lower-median fill, all-null group stays null") {
    val df = Seq(
      ("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)), ("a", 3L, Some(9.0)),
      ("a", 4L, None), // even count incl. null -> lower median of {100,200,900}
      ("b", 5L, None), ("b", 6L, None)) // no median exists
      .toDF("g", "id", "v")
    val got = Stats.imputeMedian(df, Seq("g"), "id", "v")
      .as[(String, Long, Option[Long], Boolean)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(got(1L) == (Some(100L), false))
    assert(got(4L) == (Some(200L), true)) // percentile_disc(0.5) of 3 values
    assert(got(5L) == (None, false), "all-null group must stay null")
    assert(got(6L) == (None, false))
  }

  test("rollingOutliers: squared-integer flag equals the float z-test") {
    // steady 100s with a planted spike, plus a short series under minRows
    val xs = Seq.fill(10)(100L) ++ Seq(500L) ++ Seq.fill(5)(100L)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) }
      .toDF("k", "t", "x") unionAll
      Seq(("b", 0L, 1L), ("b", 1L, 9L), ("b", 2L, 5L)).toDF("k", "t", "x")
    val got = Stats.rollingOutliers(df, "k", "t", "x",
        window = 8, kTenths = 25, minRows = 4)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toMap
    // driver-side float reference over the same trailing windows
    for (i <- xs.indices) {
      val base = xs.slice(math.max(0, i - 8), i)
      val want =
        if (base.length < 4) None
        else {
          val mu = base.sum.toDouble / base.length
          val sd = math.sqrt(
            base.map(v => (v - mu) * (v - mu)).sum / base.length)
          Some(math.abs(xs(i) - mu) > 2.5 * sd)
        }
      assert(got(("a", i.toLong)) == want, s"row $i: base=$base x=${xs(i)}")
    }
    assert(got(("a", 10L)) == Some(true), "the planted spike must flag")
    // series "b" never reaches minRows -> all null flags
    assert((0 to 2).forall(i => got(("b", i.toLong)).isEmpty))
  }

  test("outliers: constant groups and null values produce no flags") {
    val df = Seq(("c", Some(5.0)), ("c", Some(5.0)), ("c", Some(5.0)),
      ("g", Some(1.0)), ("g", Some(2.0)), ("g", None), ("g", Some(100.0)))
      .toDF("g", "v")
    val got = Stats.outliers(df, Seq("g"), "v", k = 1.0)
    assert(!got.collect().exists(_.getAs[String]("g") == "c"),
      "constant group must yield no outliers (0/0 guard)")
    assert(!got.collect().exists(r => r.isNullAt(r.fieldIndex("v"))),
      "null values are never outliers")
    assert(Stats.outliers(df.limit(0), Seq("g"), "v").count() == 0)
  }

  test("rankNormalize: min-rank ties, exact integer pct, null/singleton rules") {
    val df = Seq(("g", Some(10.0)), ("g", Some(10.0)), ("g", Some(20.0)),
      ("g", Some(30.0)), ("g", None), ("h", Some(5.0)))
      .toDF("g", "v")
    val got = Stats.rankNormalize(df, Seq("g"), "v")
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getDouble(1)),
        if (r.isNullAt(r.fieldIndex("rnk"))) None else Some(r.getLong(r.fieldIndex("rnk"))),
        if (r.isNullAt(r.fieldIndex("pct_e6"))) None else Some(r.getLong(r.fieldIndex("pct_e6")))))
      .toSet
    assert(got == Set(
      ("g", Some(10.0), Some(1L), Some(0L)),
      ("g", Some(20.0), Some(3L), Some(666666L)), // (3-1)*1e6 div 3
      ("g", Some(30.0), Some(4L), Some(1000000L)),
      ("g", None, None, None),                    // null ranks null, row kept
      ("h", Some(5.0), Some(1L), None)),          // singleton: pct undefined
      s"$got")
  }

  test("winsorize: nearest-rank bounds, clamp counts, floor-e6 mean") {
    // g: sorted 1..10; p10/p90 -> lo_rank=1, hi_rank=9 -> bounds 1, 9
    val df = ((1 to 10).map(i => ("g", i.toDouble)) :+ ("h", 5.0))
      .toDF("g", "v")
    val got = Stats.winsorize(df, Seq("g"), "v",
        pLowPpm = 100000L, pHighPpm = 900000L)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // clamped sum for g: 1..9 + (10->9) = 45 - 10 + 9 + ... = 1+..+9 + 9 = 54
    assert(got == Seq(
      ("g", 10L, 10000L, 90000L, 0L, 1L, 5400000L),
      ("h", 1L, 50000L, 50000L, 0L, 0L, 5000000L)), s"$got")
  }

  test("weightedPercentile: tie mass is atomic; plain median differs; guards") {
    // g: values 1 (w=1), 2 (w=1), 10 (w=8) -> weighted median = 10
    // (unweighted median would be 2); tie row: two rows valued 10
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 10.0, 4.0),
      ("g", 10.0, 4.0)).toDF("g", "v", "w")
    val got = Stats.weightedPercentile(df, Seq("g"), "v", "w", 500000L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 10L, 100000L)), s"$got") // 10.0 at e4 scale
    // p=20%: cum 1 of 10 at value 1 is 10% < 20 -> value 2 (cum 2/10)
    val p20 = Stats.weightedPercentile(df, Seq("g"), "v", "w", 200000L)
      .as[(String, Long, Long)].collect().toSeq
    assert(p20 == Seq(("g", 10L, 20000L)), s"$p20")
    val e = intercept[Exception] {
      Stats.weightedPercentile(Seq(("g", 1.0, 1.5)).toDF("g", "v", "w"),
        Seq("g"), "v", "w", 500000L).collect()
    }
    assert(e.getMessage.contains("integer weight"), e.getMessage)
  }

  test("quantileNormalize: identical marginals, complete-case, tie order") {
    val df = Seq(
      (1L, Some(1.0), Some(3.0)), (2L, Some(2.0), Some(1.0)),
      (3L, Some(3.0), Some(2.0)), (4L, None, Some(9.0))) // dropped row
      .toDF("id", "a", "b")
    val got = Stats.quantileNormalize(df, "id", Seq("a", "b"))
      .select("feature", "rnk", "x_e4", "norm_e4")
      .as[(String, Long, Long, Long)].collect().toSeq
    // rank means: r1 (10000+10000)/2, r2 (20000+20000)/2, r3 same
    val byFeature = got.groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(_._4)).toMap
    assert(byFeature("a") == byFeature("b"),
      s"marginals must match: $byFeature")
    assert(byFeature("a") == Seq(10000L, 20000L, 30000L), s"$byFeature")
    assert(got.size == 6, "complete-case: the null row must drop entirely")
    // asymmetric values: means blend the two distributions
    val df2 = Seq((1L, 1.0, 10.0), (2L, 2.0, 30.0), (3L, 3.0, 20.0))
      .toDF("id", "a", "b")
    val g2 = Stats.quantileNormalize(df2, "id", Seq("a", "b"))
      .select("feature", "rnk", "norm_e4")
      .as[(String, Long, Long)].collect().toSet
    val wantMeans = Map(1L -> (10000L + 100000L) / 2,
      2L -> (20000L + 200000L) / 2, 3L -> (30000L + 300000L) / 2)
    wantMeans.foreach { case (r, m) =>
      assert(g2.contains(("a", r, m)) && g2.contains(("b", r, m)), s"r=$r")
    }
  }

  test("twoSampleZ: hand-computed z; missing/degenerate pairs go null") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0),
      ("c", 4.0)).toDF("g", "v")
    val got = Stats.twoSampleZ(df, "g", "v",
        Seq("a" -> "b", "a" -> "zz", "c" -> "c"))
      .orderBy("group_a", "group_b").collect()
    // a: n=2 m=2 var=1; b: n=2 m=4 var=4 -> z=(2-4)/sqrt(.5+2)
    val z = (2.0 - 4.0) / math.sqrt(1.0 / 2 + 4.0 / 2)
    val zT = math.floor(z * 1e6) / 1e6
    val r0 = got(0)
    assert(r0.getString(0) == "a" && r0.getString(1) == "b" &&
      r0.getLong(2) == 2L && r0.getLong(3) == 2L &&
      r0.getDouble(4) == 2.0 && r0.getDouble(5) == 4.0 &&
      r0.getDouble(6) == zT, s"$r0 want z=$zT")
    val r1 = got(1) // a vs missing group
    assert(r1.getLong(3) == 0L && r1.isNullAt(5) && r1.isNullAt(6))
    val r2 = got(2) // c vs c: zero variance -> null z, means present
    assert(r2.getDouble(4) == 4.0 && r2.isNullAt(6))
  }

  test("rocAuc: separation, ties, reversal, degenerate groups") {
    // perfect separation -> 1e6; perfect reversal -> 0; all-tied
    // scores -> exactly 500000; one-class groups -> null
    val df = Seq(
      ("sep", 1.0, false), ("sep", 2.0, false), ("sep", 3.0, true),
      ("sep", 4.0, true),
      ("rev", 9.0, false), ("rev", 1.0, true),
      ("tie", 5.0, true), ("tie", 5.0, false), ("tie", 5.0, true),
      ("pos", 1.0, true), ("pos", 2.0, true),
      ("mix", 1.0, false), ("mix", 3.0, true), ("mix", 2.0, false),
      ("mix", 4.0, true), ("mix", 2.5, false))
      .toDF("g", "score", "label")
    val got = Stats.rocAuc(df, Seq("g"), "score", "label")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("sep") == ((2L, 2L, Some(1000000L))))
    assert(got("rev") == ((1L, 1L, Some(0L))))
    assert(got("tie") == ((2L, 1L, Some(500000L))))
    assert(got("pos") == ((2L, 0L, None)))
    // mix: positives at 3,4 vs negatives 1,2,2.5 -> all pos > all neg
    assert(got("mix") == ((2L, 3L, Some(1000000L))))
    // null score/label rows are excluded entirely
    val withNulls = Seq(
      ("g", java.lang.Double.valueOf(1.0), java.lang.Boolean.TRUE),
      ("g", null.asInstanceOf[java.lang.Double], java.lang.Boolean.FALSE),
      ("g", java.lang.Double.valueOf(0.5), null.asInstanceOf[java.lang.Boolean]),
      ("g", java.lang.Double.valueOf(0.0), java.lang.Boolean.FALSE))
      .toDF("g", "score", "label")
    val r2 = Stats.rocAuc(withNulls, Seq("g"), "score", "label")
      .as[(String, Long, Long, Option[Long])].collect()
    assert(r2.toSeq == Seq(("g", 1L, 1L, Some(1000000L))), r2.mkString(","))
  }

  test("dyadicEwma: hand-computed dyadic weights, warmup prefix, guards") {
    // w=2: num_i = 2*x_i + x_{i-1}, ewma_milli = 1000*num DIV 4
    val df = Seq(("k", 1L, 4L), ("k", 2L, 8L), ("k", 3L, 0L),
        ("j", 1L, 100L))
      .toDF("g", "t", "v")
    val got = Stats.dyadicEwma(df, Seq("g"), "t", "v", w = 2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // k: t1 num=8 -> 2000; t2 num=16+4=20 -> 5000; t3 num=0+8 -> 2000
    assert(got == Map(("k", 1L) -> 2000L, ("k", 2L) -> 5000L,
      ("k", 3L) -> 2000L, ("j", 1L) -> 50000L), got.toString)
    // negative value raises (Spark DIV truncates, DuckDB // floors --
    // the operator refuses rather than diverge)
    val neg = Seq(("k", 1L, -5L)).toDF("g", "t", "v")
    val e = intercept[Exception] {
      Stats.dyadicEwma(neg, Seq("g"), "t", "v", w = 2).collect()
    }
    assert(e.getMessage.contains("non-negative"), e.getMessage)
  }

  test("calibrationBins + prAtThresholds: hand-computed cells") {
    val df = Seq(
      (5.0, false), (15.0, false), (15.5, true), (25.0, true),
      (25.9, true), (999.0, true), (-3.0, false))
      .toDF("score", "lab")
    // binWidth 10, maxBin 2: bins 0,1,1,2,2,2(clamped),0(clamped)
    val cal = Stats.calibrationBins(df, Seq(), "score", "lab", 10L, 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(cal == Map(
      0L -> (2L, 0L, 0L), 1L -> (2L, 1L, 500000L),
      2L -> (3L, 3L, 1000000L)), cal.toString)
    val pr = Stats.prAtThresholds(
        df.select((col("score") * 10).cast("long").as("s"), col("lab")),
        Seq(), "s", "lab", Seq(0L, 200L))
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5), r._6, r._7))
      .toMap
    // t=0: all but -30 predicted positive -> tp=4 fp=2 fn=0 tn=1
    assert(pr(0L) == (((4L, 2L, 0L, 1L), Some(666666L), Some(1000000L))),
      pr.toString)
    // t=200: scores 250, 259, 9990 -> tp=3 fp=0 fn=1 tn=3
    assert(pr(200L) == (((3L, 0L, 1L, 3L), Some(1000000L), Some(750000L))),
      pr.toString)
  }

  test("spearman: perfect monotone, midrank ties, zero variance") {
    val perfect = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0))
      .toDF("g", "x", "y")
    val r1 = Stats.spearman(perfect, Seq("g"), "x", "y")
      .as[(String, Long, Option[Long])].collect()
    assert(r1.toSeq == Seq(("g", 3L, Some(1000000L))), r1.mkString(","))
    // ties in x: midranks (1.5, 1.5, 3) vs y ranks (1, 2, 3)
    // -> rho = sqrt(3)/2 = 0.8660254... -> floor e6 866025
    val tied = Seq(("g", 1.0, 10.0), ("g", 1.0, 20.0), ("g", 2.0, 30.0))
      .toDF("g", "x", "y")
    val r2 = Stats.spearman(tied, Seq("g"), "x", "y")
      .as[(String, Long, Option[Long])].collect()
    assert(r2.toSeq == Seq(("g", 3L, Some(866025L))), r2.mkString(","))
    // constant x -> zero rank variance -> null rho
    val const = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)).toDF("g", "x", "y")
    val r3 = Stats.spearman(const, Seq("g"), "x", "y")
      .as[(String, Long, Option[Long])].collect()
    assert(r3.toSeq == Seq(("g", 2L, None)), r3.mkString(","))
  }

  test("kendallTau: hand-counted pairs, tau-b ties, grain guard") {
    val df = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 2.0, 3.0),
        ("g", 3L, 3.0, 2.0), ("g", 4L, 4.0, 4.0))
      .toDF("g", "id", "x", "y")
    val r1 = Stats.kendallTau(df, Seq("g"), "id", "x", "y")
      .as[(String, Long, Long, Long, Option[Long])].collect()
    // 6 pairs: C=5, D=1, no ties -> tau = 4/6 -> 666666
    assert(r1.toSeq == Seq(("g", 6L, 5L, 1L, Some(666666L))),
      r1.mkString(","))
    // tau-b: x-tie pair excluded from x denominator only
    // C=2, D=0, tx=1, ty=0 -> 2/sqrt(2*3) = 0.816496... -> 816496
    val tied = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 1.0, 2.0),
        ("g", 3L, 2.0, 3.0)).toDF("g", "id", "x", "y")
    val r2 = Stats.kendallTau(tied, Seq("g"), "id", "x", "y")
      .as[(String, Long, Long, Long, Option[Long])].collect()
    assert(r2.toSeq == Seq(("g", 3L, 2L, 0L, Some(816496L))),
      r2.mkString(","))
    // the O(n^2) guard: a group over maxRows raises loudly
    val e = intercept[Exception] {
      Stats.kendallTau(df, Seq("g"), "id", "x", "y", maxRows = 3L)
        .collect()
    }
    assert(e.getMessage.contains("aggregate-grain"), e.getMessage)
  }

  test("regression2: recovers an exact plane; collinear/constant null") {
    // y = 3 + 2*x1 + 5*x2 over a full 5x5 grid: exact recovery
    val grid = for (i <- 1 to 5; j <- 1 to 5)
      yield ("g", i.toDouble, j.toDouble, 3.0 + 2.0 * i + 5.0 * j)
    val r = Stats.regression2(grid.toDF("g", "x1", "x2", "y"),
      Seq("g"), "x1", "x2", "y").head()
    assert(r.getAs[Long]("n") == 25L)
    assert(math.abs(r.getAs[Double]("b0") - 3.0) <= 1e-6, r.toString)
    assert(math.abs(r.getAs[Double]("b1") - 2.0) <= 1e-6, r.toString)
    assert(math.abs(r.getAs[Double]("b2") - 5.0) <= 1e-6, r.toString)
    assert(r.getAs[Double]("r2") >= 0.999999 - 1e-9, r.toString)
    // perfectly collinear regressors (x2 = 2*x1, small ints -> det
    // exactly 0 in doubles) -> null coefficients, never Inf/NaN
    val coll = (1 to 4).map(i =>
      ("g", i.toDouble, 2.0 * i, i.toDouble)).toDF("g", "x1", "x2", "y")
    val rc = Stats.regression2(coll, Seq("g"), "x1", "x2", "y").head()
    assert(rc.isNullAt(rc.fieldIndex("b1")), rc.toString)
    // constant regressor -> null via the exact min=max rule
    val const = (1 to 4).map(i =>
      ("g", i.toDouble, 7.0, i.toDouble)).toDF("g", "x1", "x2", "y")
    val rk = Stats.regression2(const, Seq("g"), "x1", "x2", "y").head()
    assert(rk.isNullAt(rk.fieldIndex("b0")), rk.toString)
  }

  test("bestBreakpoint: finds the slope change; ties to smallest") {
    // y = x below 10, flat 10 after: two perfect lines split at 10
    val series = (0L until 20L).map(x =>
      ("g", x, if (x < 10) x else 10L)).toDF("g", "x", "y")
    val r = Stats.bestBreakpoint(series, Seq("g"), "x", "y",
      Seq(5L, 10L, 15L)).head()
    assert(r.getAs[Long]("best_break") == 10L, r.toString)
    assert(r.getAs[Long]("sse_div1e6") == 0L, r.toString)
    assert(r.getAs[Long]("n_before") == 10L &&
      r.getAs[Long]("n_after") == 10L, r.toString)
    // one global line: every candidate fits perfectly -> smallest wins
    val line = (0L until 12L).map(x => ("g", x, 3 * x)).toDF("g", "x", "y")
    val rl = Stats.bestBreakpoint(line, Seq("g"), "x", "y",
      Seq(4L, 8L)).head()
    assert(rl.getAs[Long]("best_break") == 4L, rl.toString)
  }

  test("theilSen: outlier-immune median slope; grain guard") {
    // 0,10,20 then a wild outlier at x=3: median pairwise slope stays 10
    val df = Seq(("g", 0L, 0L), ("g", 1L, 10L), ("g", 2L, 20L),
      ("g", 3L, 1000L)).toDF("g", "x", "y")
    val r = Stats.theilSen(df, Seq("g"), "x", "y").head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("slope_e6") == 10000000L, r.toString)
    // negative slopes floor correctly (double-floor, not truncate):
    // points (0,1), (2,0): slope -0.5 -> floor(-5e5) = -500000
    val neg = Seq(("g", 0L, 1L), ("g", 2L, 0L)).toDF("g", "x", "y")
    val rn = Stats.theilSen(neg, Seq("g"), "x", "y").head()
    assert(rn.getAs[Long]("slope_e6") == -500000L, rn.toString)
    val e = intercept[Exception] {
      Stats.theilSen(df, Seq("g"), "x", "y", maxRows = 2L).collect()
    }
    assert(e.getMessage.contains("aggregate-grain"), e.getMessage)
  }

  test("bootstrapMeanCI: degenerate exactness, guards, determinism") {
    // constant series: every resample mean equals the observed mean,
    // so the CI collapses to a point — exact, not approximate
    val const = (0L until 20L).map(i => ("g", i, 7L)).toDF("g", "idx", "v")
    val r = Stats.bootstrapMeanCI(const, Seq("g"), "idx", "v",
        nResamples = 50).head()
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("obs_mean_milli") == 7000L)
    assert(r.getAs[Long]("ci_lo_milli") == 7000L)
    assert(r.getAs[Long]("ci_hi_milli") == 7000L)
    // varying series: bounds are ordered, bracket nothing impossible,
    // and the whole computation is partition-independent
    val vary = (0L until 12L).map(i => ("g", i, i * 100L))
      .toDF("g", "idx", "v")
    val a = Stats.bootstrapMeanCI(vary, Seq("g"), "idx", "v",
      nResamples = 40).head()
    val b = Stats.bootstrapMeanCI(vary.repartition(7), Seq("g"), "idx", "v",
      nResamples = 40).head()
    assert(a.getAs[Long]("ci_lo_milli") <= a.getAs[Long]("ci_hi_milli"))
    assert(a.getAs[Long]("ci_lo_milli") == b.getAs[Long]("ci_lo_milli"))
    assert(a.getAs[Long]("ci_hi_milli") == b.getAs[Long]("ci_hi_milli"))
    // gap in the index raises (a silent gap would bias every draw)
    val gap = Seq(("g", 0L, 1L), ("g", 2L, 1L)).toDF("g", "idx", "v")
    val e1 = intercept[Exception] {
      Stats.bootstrapMeanCI(gap, Seq("g"), "idx", "v").collect()
    }
    assert(e1.getMessage.contains("dense"), e1.getMessage)
    // negative values raise (floor-div divergence rule)
    val neg = Seq(("g", 0L, -1L)).toDF("g", "idx", "v")
    val e2 = intercept[Exception] {
      Stats.bootstrapMeanCI(neg, Seq("g"), "idx", "v").collect()
    }
    assert(e2.getMessage.contains("negative"), e2.getMessage)
  }

  test("permutationTest: null-effect exactness, counts, determinism") {
    // constant values: every permutation's diff equals the observed 0,
    // so n_extreme = B and p = 1.0 exactly
    val const = (1L to 10L).map(i => (i, i <= 4L, 5L)).toDF("id", "lab", "v")
    val r = Stats.permutationTest(const, Seq.empty, "id", "lab", "v",
      nPerms = 20).head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 6L)
    assert(r.getAs[Long]("obs_diff_milli") == 0L)
    assert(r.getAs[Long]("n_extreme") == 20L)
    assert(r.getAs[Long]("p_ppm") == 1000000L)
    // a maximal separation is never exceeded but can be matched:
    // p stays small; and the test is partition-independent
    val sep = (1L to 10L).map(i => (i, i <= 5L, if (i <= 5L) 100L else 0L))
      .toDF("id", "lab", "v")
    val a = Stats.permutationTest(sep, Seq.empty, "id", "lab", "v",
      nPerms = 50).head()
    val b = Stats.permutationTest(sep.toDF.repartition(5), Seq.empty,
      "id", "lab", "v", nPerms = 50).head()
    assert(a.getAs[Long]("obs_diff_milli") == 100000L)
    assert(a.getAs[Long]("n_extreme") == b.getAs[Long]("n_extreme"))
    assert(a.getAs[Long]("p_ppm") == b.getAs[Long]("p_ppm"))
    assert(a.getAs[Long]("p_ppm") < 500000L, a.toString)
    // negative values raise
    val neg = Seq((1L, true, -5L)).toDF("id", "lab", "v")
    val e = intercept[Exception] {
      Stats.permutationTest(neg, Seq.empty, "id", "lab", "v").collect()
    }
    assert(e.getMessage.contains("negative"), e.getMessage)
    // degenerate group (label never varies): no testable hypothesis —
    // n_extreme and p_ppm must be NULL, not the add-one minimum that
    // would read as maximal significance
    val degen = Seq(("a", 1L, true, 5L), ("a", 2L, true, 7L),
        ("b", 1L, true, 5L), ("b", 2L, false, 9L))
      .toDF("g", "id", "lab", "v")
    val dr = Stats.permutationTest(degen, Seq("g"), "id", "lab", "v",
        nPerms = 20).collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(dr("a").isNullAt(dr("a").fieldIndex("p_ppm")), dr.toString)
    assert(dr("a").isNullAt(dr("a").fieldIndex("n_extreme")), dr.toString)
    assert(!dr("b").isNullAt(dr("b").fieldIndex("p_ppm")), dr.toString)
  }

  test("acf: hand-computed lags on 1,2,3,4 and index-gap semantics") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
        ("g", 4L, 4L)).toDF("g", "idx", "v")
    // cv = 4v-10: -6,-2,2,6; den=80
    // lag1: 20/80 -> 250000; lag2: -24/80 -> -300000; lag3: -36/80 -> -450000
    val got = Stats.acf(df, Seq("g"), "idx", "v", maxLag = 3)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> ((r._3, r._5))).toMap
    assert(got == Map(1L -> ((3L, Some(250000L))),
      2L -> ((2L, Some(-300000L))), 3L -> ((1L, Some(-450000L)))),
      got.toString)
    // pairing is strict index equality: a gap drops the pair, it does
    // not slide (idx 1,2,4: lag1 pairs only (1,2); lag2 only (2,4))
    val gap = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 4L, 4L))
      .toDF("g", "idx", "v")
    val np = Stats.acf(gap, Seq("g"), "idx", "v", maxLag = 2)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(np == Map(1L -> 1L, 2L -> 1L), np.toString)
  }
}
