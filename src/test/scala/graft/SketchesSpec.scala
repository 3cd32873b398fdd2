package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Probabilistic-sketch invariants (q61-q63's operators): accuracy of
  * the estimators, the one-sided error contracts, mergeability (the
  * property that makes each sketch a 100 TB primitive — states combine
  * without rescanning), and partitioning-independence of the portable
  * hash.
  */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val keys = (1 to 5000).map(i => s"key_$i").toDF("k")

  test("HLL corrected estimate within 15% of truth at 5k distinct") {
    val st = Sketches.hllState(keys, "k")
    val est = Sketches.hllEstimate(st, Nil).select("est").as[Double].head()
    assert(math.abs(est - 5000) / 5000.0 < 0.15, s"estimate $est")
  }

  test("HLL small-range correction engages and is accurate at 20 distinct") {
    val small = (1 to 20).map(i => s"s_$i").toDF("k")
    val est = Sketches.hllEstimate(Sketches.hllState(small, "k"), Nil)
      .select("est").as[Double].head()
    assert(math.abs(est - 20) / 20.0 < 0.35, s"estimate $est")
  }

  test("HLL state is mergeable: state(A ++ B) == merge(state(A), state(B))") {
    val a = (1 to 3000).map(i => s"key_$i").toDF("k")
    val b = (2000 to 5000).map(i => s"key_$i").toDF("k") // overlapping halves
    val merged = Sketches.hllState(a, "k").unionAll(Sketches.hllState(b, "k"))
      .groupBy("bucket").agg(max("max_rho").as("max_rho"))
    val direct = Sketches.hllState(a.unionAll(b), "k")
    assert(merged.orderBy("bucket").collect().toSeq ==
      direct.orderBy("bucket").collect().toSeq)
  }

  test("hllMerge rolls a grouping level up to exactly the direct state") {
    import org.apache.spark.sql.functions.col
    // per-(g, day) states merged over day == the one-pass per-g state
    val rows = (1 to 4000).map(i => (s"g${i % 3}", i % 17, s"key_${i % 900}"))
      .toDF("g", "day", "k")
    val rolled = Sketches.hllMerge(
        Sketches.hllState(rows, "k", Seq("g", "day")), Seq("g"))
      .orderBy("g", "bucket").collect().toSeq
    val direct = Sketches.hllState(rows.select(col("g"), col("k")), "k", Seq("g"))
      .orderBy("g", "bucket").collect().toSeq
    assert(rolled == direct)
  }

  test("hllOverlap: pair-union estimate equals the direct union sketch") {
    import org.apache.spark.sql.functions.col
    val rows = ((1 to 400).map(i => ("a", i.toLong)) ++
      (200 to 600).map(i => ("b", i.toLong)) ++
      (900 to 950).map(i => ("c", i.toLong))).toDF("g", "u")
    val got = Sketches.hllOverlap(
        Sketches.hllState(rows, "u", Seq("g")), "g")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // register-max associativity: the pairwise-merged union estimate
    // must EQUAL the estimate of the physically unioned segment
    val direct = Sketches.hllRawEstimate(
        Sketches.hllState(rows.where(col("g") =!= "c").select("u").distinct(),
          "u"), Nil)
      .head.getAs[Double]("raw_est")
    val ab = got(("a", "b"))
    assert(ab.getAs[Double]("est_union") == direct)
    // inclusion-exclusion arithmetic holds row-wise
    assert(ab.getAs[Double]("est_intersect") ==
      ab.getAs[Double]("est_a") + ab.getAs[Double]("est_b") -
        ab.getAs[Double]("est_union"))
    // heavy overlap (201 shared) ranks far above the disjoint pairs
    assert(ab.getAs[Double]("est_intersect") >
      got(("a", "c")).getAs[Double]("est_intersect"))
  }

  test("hllRolling: windowed registers equal the direct union state") {
    import org.apache.spark.sql.functions.col
    // day 1: keys 0..99; day 2: 50..149; day 4: 200..219 (gap at 3)
    val rows = ((0 until 100).map(k => (1L, s"k$k")) ++
      (50 until 150).map(k => (2L, s"k$k")) ++
      (200 until 220).map(k => (4L, s"k$k"))).toDF("day", "u")
    val rolled = Sketches.hllRolling(
        Sketches.hllState(rows, "u", Seq("day")), Nil, "day", windowDays = 2)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Double]("raw_est")).toMap
    def direct(days: Long*) = Sketches.hllRawEstimate(
      Sketches.hllState(rows.where(col("day").isin(days: _*)).select("u"), "u"),
      Nil).head.getAs[Double]("raw_est")
    assert(rolled.keySet == Set(1L, 2L, 4L), "report only days that occur")
    assert(rolled(1L) == direct(1L))
    assert(rolled(2L) == direct(1L, 2L), "window merges both days' registers")
    // the gap: day 4's window [3,4] contains only day 4
    assert(rolled(4L) == direct(4L), "gap day must not leak day 2 in")
  }

  test("HLL state is partitioning-independent") {
    val st1 = Sketches.hllState(keys.repartition(1), "k").orderBy("bucket").collect().toSeq
    val st7 = Sketches.hllState(keys.repartition(7), "k").orderBy("bucket").collect().toSeq
    assert(st1 == st7)
  }

  test("count-min never underestimates and is exact for unseen keys") {
    val data = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("k")
    val exact = data.groupBy("k").count()
    val sk = Sketches.cmSketch(data, "k", depth = 4, width = 64)
    val probed = Sketches.cmLookup(sk, exact, "k")
    val bad = probed.where(col("cm_est") < col("count")).count()
    assert(bad == 0, "cm_est must be >= exact count for every present key")
    val unseen = Seq("never_seen_a", "never_seen_b").toDF("k")
    // an absent key can only overestimate via collision, never go negative
    val u = Sketches.cmLookup(sk, unseen, "k")
      .select("cm_est").as[Long].collect()
    assert(u.forall(_ >= 0))
  }

  test("count-min states merge by summing cells; geometry mismatch rejected") {
    val a = (1 to 100).map(i => s"k${i % 10}").toDF("k")
    val b = (1 to 50).map(i => s"k${i % 5}").toDF("k")
    val merged = Sketches.cmSketch(a, "k", 4, 64).merge(Sketches.cmSketch(b, "k", 4, 64))
    val direct = Sketches.cmSketch(a.unionAll(b), "k", 4, 64)
    assert(merged.cells.orderBy("d", "w").collect().toSeq ==
      direct.cells.orderBy("d", "w").collect().toSeq)
    intercept[IllegalArgumentException] {
      Sketches.cmSketch(a, "k", 4, 64).merge(Sketches.cmSketch(b, "k", 4, 128))
    }
  }

  test("histogram quantiles within one bucket width of the true percentile") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 10000).sorted
    val df = vals.toDF("v")
    val st = Sketches.histState(df, "v", width = 100.0)
    val row = Sketches.histQuantiles(st, qs = Seq(0.5, 0.9)).head()
    assert(row.getAs[Long]("n") == 5000L)
    // estimate is the containing bucket's LOWER boundary
    val trueP50 = vals(math.ceil(0.5 * 5000).toInt - 1)
    val trueP90 = vals(math.ceil(0.9 * 5000).toInt - 1)
    assert(math.abs(row.getAs[Double]("p50") - trueP50) <= 100.0, s"p50 ${row}")
    assert(math.abs(row.getAs[Double]("p90") - trueP90) <= 100.0, s"p90 ${row}")
  }

  test("histogram state merges by summing bucket counts; width mismatch rejected") {
    val a = (1 to 1000).map(_.toDouble).toDF("v")
    val b = (500 to 1500).map(_.toDouble).toDF("v")
    val merged = Sketches.histState(a, "v", 50.0).merge(Sketches.histState(b, "v", 50.0))
    val direct = Sketches.histState(a.unionAll(b), "v", 50.0)
    assert(merged.buckets.orderBy("bucket").collect().toSeq ==
      direct.buckets.orderBy("bucket").collect().toSeq)
    intercept[IllegalArgumentException] {
      Sketches.histState(a, "v", 50.0).merge(Sketches.histState(b, "v", 25.0))
    }
  }

  test("histogram drops nulls: they have no bucket and must not shift n") {
    val df = (Seq.fill(5)(null.asInstanceOf[java.lang.Double]) ++
      (1 to 10).map(i => java.lang.Double.valueOf(i * 10.0))).toDF("v")
    val st = Sketches.histState(df, "v", width = 100.0)
    val row = Sketches.histQuantiles(st, qs = Seq(0.5)).head()
    assert(row.getAs[Long]("n") == 10L, "n must count only non-null values")
  }

  test("bloom has no false negatives; FP rate sane at design load") {
    val members = (1 to 2000).map(i => s"m_$i").toDF("k")
    val bits = Sketches.bloomBits(members, "k")
    val posOnMembers = Sketches.bloomProbe(bits, members, "k")
      .where(!col("maybe_member")).count()
    assert(posOnMembers == 0, "a Bloom filter must never reject a member")
    val outsiders = (1 to 2000).map(i => s"o_$i").toDF("k")
    val fp = Sketches.bloomProbe(bits, outsiders, "k")
      .where(col("maybe_member")).count()
    // 6000 set bits of 16384 (~31% fill), k=3 => expected FP ~3%; allow slack
    assert(fp < 200, s"false-positive count $fp out of 2000 probes")
  }

  test("bloom bits are a set union across batches; geometry mismatch rejected") {
    val a = (1 to 500).map(i => s"m_$i").toDF("k")
    val b = (400 to 900).map(i => s"m_$i").toDF("k")
    val merged = Sketches.bloomBits(a, "k").merge(Sketches.bloomBits(b, "k"))
    val direct = Sketches.bloomBits(a.unionAll(b), "k")
    assert(merged.bits.orderBy("bit").collect().toSeq ==
      direct.bits.orderBy("bit").collect().toSeq)
    intercept[IllegalArgumentException] {
      Sketches.bloomBits(a, "k").merge(Sketches.bloomBits(b, "k", mBits = 8192))
    }
  }

  test("bloomPrune: keeps every member row, drops nulls, join-equivalent") {
    val dim = Seq(3L, 7L, 11L).toDF("k")
    val fact = ((1L to 40L).map(Some(_)) :+ None)
      .map(k => (k, s"p_${k.getOrElse(-1L)}")).toDF("k", "payload")
    val bloom = Sketches.bloomBits(dim, "k")
    val pruned = Sketches.bloomPrune(bloom, fact, "k")
    val kept = pruned.select("k").as[Long].collect().toSet
    assert(Set(3L, 7L, 11L).subsetOf(kept), "no false negatives")
    assert(!pruned.columns.contains("bit"), "prune must not add columns")
    // exact join after the prune == exact join without it
    val a = pruned.join(dim, Seq("k")).orderBy("k", "payload").collect().toSeq
    val b = fact.join(dim, Seq("k")).orderBy("k", "payload").collect().toSeq
    assert(a == b)
    assert(pruned.where(col("k").isNull).count() == 0,
      "null keys match no equi-join row and must not survive the prune")
  }

  private def quantFixture(n: Int, g: String = "g") =
    (1 to n).map(i => (g, i.toLong * 3 % 7919, i.toLong)) // scrambled values
      .toDF("g", "v", "k")

  test("quantState: exact nearest-rank when n <= cap (level 0)") {
    val df = quantFixture(200)
    val st = Sketches.quantState(df, "v", "k", Seq("g"), cap = 256)
    assert(st.meta.select("level").as[Int].head() == 0)
    assert(st.items.count() == 200L)
    val qs = Sketches.quantQuantiles(st, Seq(0L, 500000L, 1000000L))
      .orderBy("q_ppm").collect()
    val sorted = df.select("v").as[Long].collect().sorted
    // level 0: est_rank = true rank, so the argmin IS nearest-rank;
    // q=0.5 targets rank 99.5 — ranks 99 and 100 tie and the rule
    // breaks ties to the LOWER est_rank, hence sorted(99)
    assert(qs(0).getAs[Long]("value") == sorted(0))
    assert(qs(1).getAs[Long]("value") == sorted(99))
    assert(qs(2).getAs[Long]("value") == sorted(199))
  }

  test("quantState: rank error bounded at n >> cap; level is minimal") {
    val n = 20000
    val df = quantFixture(n)
    val st = Sketches.quantState(df, "v", "k", Seq("g"), cap = 256)
    val level = st.meta.select("level").as[Int].head()
    val kept = st.items.count()
    assert(kept <= 256, s"cap violated: $kept")
    // minimal level: one level down must exceed the cap (re-derive the
    // full item set with an effectively-unbounded cap to count it)
    assert(level > 0)
    val full = Sketches.quantState(df, "v", "k", Seq("g"), cap = 1 << 20)
    val keptDown = full.items.where(col("lmax") >= level - 1).count()
    assert(keptDown > 256, s"level $level not minimal ($keptDown at -1)")
    // measured rank error of every readout ≤ 8% of n (deterministic
    // given the fixed hash; theory predicts ~n/√cap ≈ 6.25% max-ish)
    val sorted = df.select("v").as[Long].collect().sorted
    val out = Sketches.quantQuantiles(st,
      Seq(250000L, 500000L, 900000L)).collect()
    out.foreach { r =>
      val target = r.getAs[Long]("q_ppm").toDouble / 1e6 * (n - 1)
      val v = r.getAs[Long]("value")
      val trueRank = sorted.indexWhere(_ >= v) // first occurrence
      assert(math.abs(trueRank - target) <= 0.08 * n,
        s"q=${r.getAs[Long]("q_ppm")}: trueRank=$trueRank target=$target")
    }
  }

  test("quantState merge: associative and EQUAL to the single-shot build") {
    val all = quantFixture(6000)
    val parts = Seq(
      all.where(col("k") % 3 === 0), all.where(col("k") % 3 === 1),
      all.where(col("k") % 3 === 2))
    val states = parts.map(p =>
      Sketches.quantState(p, "v", "k", Seq("g"), cap = 64))
    val direct = Sketches.quantState(all, "v", "k", Seq("g"), cap = 64)
    val leftFold = states(0).merge(states(1)).merge(states(2))
    val rightFold = states(0).merge(states(1).merge(states(2)))
    def canon(s: Sketches.QuantState) =
      (s.items.select("g", "v", "h", "lmax").collect().map(_.toSeq).toSet,
        s.meta.select("g", "n", "level").collect().map(_.toSeq).toSet)
    assert(canon(leftFold) == canon(direct), "merge != build")
    assert(canon(rightFold) == canon(direct), "associativity")
    // cap/salt mismatch rejected
    val other = Sketches.quantState(all, "v", "k", Seq("g"), cap = 128)
    intercept[IllegalArgumentException] { direct.merge(other) }
  }

  test("quantState: ungrouped (global) path — build, merge, readout") {
    val df = (1 to 500).map(i => (i.toLong * 7 % 3001, i.toLong))
      .toDF("v", "k")
    val st = Sketches.quantState(df, "v", "k", Nil, cap = 64)
    assert(st.meta.select("n").as[Long].head() == 500L)
    val parts = Seq(df.where(col("k") % 2 === 0), df.where(col("k") % 2 === 1))
      .map(p => Sketches.quantState(p, "v", "k", Nil, cap = 64))
    val merged = parts(0).merge(parts(1))
    def canon(s: Sketches.QuantState) =
      s.items.select("v", "h", "lmax").collect().map(_.toSeq).toSet
    assert(canon(merged) == canon(st), "ungrouped merge != build")
    val out = Sketches.quantQuantiles(merged, Seq(500000L)).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n") == 500L)
  }

  test("quantRolling: each window equals the single-shot build over its rows") {
    // 3 days × 60 rows; window 2 → day d's report must equal a direct
    // build over days {d-1, d} — the per-window merge ≡ build identity
    val df = (0 until 180).map { i =>
      ("g", (i / 60).toLong, (i * 13 % 509).toLong, i.toLong)
    }.toDF("g", "day", "v", "k")
    val rolled = Sketches.quantRolling(df, "v", "k", Seq("g"), "day",
        windowDays = 2, qPpms = Seq(500000L), cap = 32)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n"), r.getAs[Int]("level"),
          r.getAs[Long]("value"))).toMap
    assert(rolled.keySet == Set(0L, 1L, 2L))
    (0L to 2L).foreach { d =>
      val win = df.where(col("day") >= d - 1 && col("day") <= d)
      val direct = Sketches.quantQuantiles(
        Sketches.quantState(win, "v", "k", Seq("g"), cap = 32),
        Seq(500000L)).collect().head
      assert(rolled(d) == ((direct.getAs[Long]("n"),
        direct.getAs[Int]("level"), direct.getAs[Long]("value"))),
        s"day $d: ${rolled(d)} vs direct")
    }
  }

  test("quantState: duplicate keys raise loudly") {
    val dup = Seq(("g", 1L, 5L), ("g", 2L, 5L)).toDF("g", "v", "k")
    val e = intercept[Exception] {
      Sketches.quantState(dup, "v", "k", Seq("g")).meta.collect()
    }
    assert(e.getMessage.contains("not unique"), e.getMessage)
  }
}
