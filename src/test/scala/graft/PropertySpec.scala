package graft

import graft.operators.{CorpusPrep, Dedup, Sampling, Sessionize, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized property checks against independent driver-side
  * reference implementations — many small random instances instead of
  * a few hand-picked ones.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  test("connectedComponents equals driver-side union-find on random graphs") {
    val rnd = new Random(101)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      if (edges.nonEmpty) {
        // reference: plain union-find with min-label components
        val parent = Array.tabulate(n.toInt)(identity)
        def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = vertices.map(v => v -> find(v.toInt).toLong).toMap
        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"trial $trial: $edges")
      }
    }
  }

  test("connectedComponents on STRING ids equals driver union-find (generic pre-pass path)") {
    val rnd = new Random(303)
    (1 to 3).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      def key(i: Int) = f"n$i%04d" // ASCII, so Java order == UTF8 binary order
      val edges = Seq.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      if (edges.nonEmpty) {
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = vertices.map(v => key(v) -> key(find(v))).toMap
        val got = Dedup.connectedComponents(
            edges.map { case (a, b) => (key(a), key(b)) }.toDF("id_a", "id_b"))
          .as[(String, String)].collect().toMap
        assert(got == want, s"trial $trial: $edges")
      }
    }
  }

  test("sessions partition the events and respect the gap on random inputs") {
    val rnd = new Random(202)
    val gap = 100L
    (1 to 3).foreach { trial =>
      val events = Seq.tabulate(120) { i =>
        (i.toLong, rnd.nextInt(2000).toLong, (1 + rnd.nextInt(3)).toLong,
          rnd.nextInt(10).toDouble)
      }
      val df = events.toDF("event_id", "ts", "user_id", "value")
      val sessions = Sessionize.sessions(df, "user_id", "ts", "event_id", "value", gap)
        .as[(Long, Long, Long, Int, Double)].collect()
      // every event in exactly one session
      assert(sessions.map(_._4).sum == events.size, s"trial $trial: lost events")
      // per-user value totals preserved (decimal-exact for these inputs)
      val wantTotals = events.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
      val gotTotals = sessions.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
      wantTotals.foreach { case (u, w) =>
        assert(math.abs(gotTotals(u) - w) < 1e-9, s"trial $trial user $u totals")
      }
      sessions.groupBy(_._1).foreach { case (u, ss) =>
        val sorted = ss.sortBy(_._2)
        // sessions are ordered, non-overlapping, separated by > gap
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b._2 - a._3 > gap, s"trial $trial user $u: gap violated")
          case _ =>
        }
        // every session internally has no hole > gap is implied by the
        // event-level construction; bounds must be consistent
        sorted.foreach(s => assert(s._2 <= s._3))
      }
    }
  }

  test("salted join equals plain join on random keyed data") {
    val rnd = new Random(303)
    (1 to 3).foreach { trial =>
      val probe = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(100).toLong))
        .toDF("k", "pv")
      val build = Seq.fill(40)((rnd.nextInt(25).toLong, rnd.nextInt(100).toLong))
        .toDF("k", "bv")
      val salted = SkewJoin.saltedInnerJoin(probe, build, Seq("k"),
          numSalts = 1 + rnd.nextInt(8))
        .select("k", "pv", "bv").as[(Long, Long, Long)].collect().sorted.toSeq
      val plain = probe.join(build, Seq("k"))
        .select("k", "pv", "bv").as[(Long, Long, Long)].collect().sorted.toSeq
      assert(salted == plain, s"trial $trial diverged")
    }
  }

  test("chunk reconstructs the document exactly on random geometries") {
    val rnd = new Random(404)
    (1 to 8).foreach { trial =>
      val n = 1 + rnd.nextInt(300)
      val chunkTokens = 2 + rnd.nextInt(80)
      val overlap = rnd.nextInt(chunkTokens) // 0 <= overlap < chunkTokens
      val step = chunkTokens - overlap
      val toks = (0 until n).map(i => s"t${trial}_$i")
      val rows = CorpusPrep.chunk(
          Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
          "doc_id", "text", chunkTokens, overlap)
        .orderBy("chunk_idx")
        .select("chunk_idx", "chunk_len").as[(Long, Int)].collect().toSeq
      // driver-side reference: keep adding windows until the last one
      // reaches the document's end — independent of the operator's
      // closed-form chunk-count arithmetic
      val starts = scala.collection.mutable.ArrayBuffer(0)
      while (starts.last + chunkTokens < n) starts += starts.last + step
      assert(rows.size == starts.size,
        s"trial $trial (n=$n c=$chunkTokens o=$overlap): ${rows.size} vs ${starts.size}")
      // stitching chunks (dropping each later chunk's overlap prefix)
      // must reproduce the document token count exactly
      val covered = rows.map(_._2).sum - overlap * (rows.size - 1)
      assert(covered == n, s"trial $trial: covered $covered of $n tokens")
      // every full-position chunk has exactly chunkTokens; only the
      // last may be shorter
      rows.dropRight(1).foreach { case (i, len) =>
        assert(len == chunkTokens, s"trial $trial chunk $i len $len")
      }
    }
  }

  test("weightedHashSample is monotone in the weight, pointwise") {
    // for a fixed id the uniform draw is fixed, so raising the keep
    // probability can only ADD rows — the property that makes staged
    // quality thresholds consistent (a doc admitted at p stays admitted
    // at p' > p)
    val rnd = new Random(505)
    val rows = Seq.tabulate(3000)(i => (i.toLong, rnd.nextDouble()))
    val df = rows.toDF("id", "p")
    val low = Sampling.weightedHashSample(df, "id", col("p"))
      .select("id").as[Long].collect().toSet
    val high = Sampling.weightedHashSample(df, "id",
        least(col("p") + 0.3, lit(1.0)))
      .select("id").as[Long].collect().toSet
    assert(low.subsetOf(high),
      s"raising weights dropped ${(low -- high).size} rows")
    assert(high.size > low.size, "sanity: higher weights admit more rows")
  }

  test("rowUniqueSalt join stays exact on byte-identical duplicate probe rows") {
    // the shape the deterministic row-hash salt cannot spread (every
    // probe row identical => one salt value): rowUniqueSalt must still
    // return exactly the plain join's multiset — every duplicate row
    // meets the build side under whatever salt it received
    val probe = spark.range(5000).select(lit(7L).as("k"), lit(0L).as("pv"))
    val build = Seq((7L, 1L), (7L, 2L), (8L, 3L)).toDF("k", "bv")
    val salted = SkewJoin.saltedInnerJoin(probe, build, Seq("k"),
        numSalts = 16, rowUniqueSalt = true)
      .groupBy("k", "bv").count().as[(Long, Long, Long)].collect().toSet
    assert(salted == Set((7L, 1L, 5000L), (7L, 2L, 5000L)))
  }

  test("robustOutliers equals a driver-side median/MAD reference on random data") {
    import graft.operators.Stats
    val rnd = new Random(23)
    (1 to 3).foreach { trial =>
      // 2-decimal fixed-point values with planted spikes
      val rows = Seq.tabulate(300)(i => (i.toLong, s"g${i % 2}",
        math.floor((5 + rnd.nextGaussian()) * 100) / 100)) ++
        Seq((900L, "g0", 200.0), (901L, "g1", -150.0))
      def medianOfLongs(xs: Seq[Long]): Double = {
        val s = xs.sorted; val n = s.length
        if (n % 2 == 1) s(n / 2).toDouble else (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
      val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val sv = rs.map(r => (r._1, math.round(r._3 * 100)))
        val med2 = medianOfLongs(sv.map(_._2)) * 2
        val d2 = sv.map { case (id, v) => (id, math.abs(v * 2 - med2)) }
        val mad4 = medianOfLongs(d2.map(_._2.toLong)) * 2
        if (mad4 <= 0) Nil
        else d2.filter { case (_, d) =>
          (d / 2.0 / 100) / (1.4826 * (mad4 / 4.0) / 100) > 3.0
        }.map(_._1)
      }.toSet
      val got = Stats.robustOutliers(rows.toDF("id", "g", "v"), Seq("g"), "v")
        .select("id").as[Long].collect().toSet
      assert(got == expected, s"trial $trial: spark-only=${got -- expected} " +
        s"local-only=${expected -- got}")
      assert(got.contains(900L) && got.contains(901L), "planted spikes missed")
    }
  }

  test("as-of joins equal driver-side brute force with random ties and tolerances") {
    import graft.operators.AsOfJoin
    val rnd = new Random(17)
    (1 to 4).foreach { trial =>
      // small ts range forces equal-ts collisions on BOTH sides
      val left = Seq.tabulate(80)(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, i.toLong))
      val right = Seq.tabulate(60)(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, 1000L + i))
      val tol = if (trial % 2 == 0) -1L else rnd.nextInt(8).toLong
      def bruteBack(l: (Long, Long, Long)): Option[Long] =
        right.filter(r => r._1 == l._1 && r._2 <= l._2 &&
            (tol < 0 || l._2 - r._2 <= tol))
          .sortBy(r => (-r._2, -r._3)).headOption.map(_._3)
      def bruteFwd(l: (Long, Long, Long)): Option[Long] =
        right.filter(r => r._1 == l._1 && r._2 >= l._2 &&
            (tol < 0 || r._2 - l._2 <= tol))
          .sortBy(r => (r._2, r._3)).headOption.map(_._3)
      val ldf = left.toDF("k", "t", "id"); val rdf = right.toDF("k", "t", "id")
      val back = AsOfJoin.latestAsOf(ldf, rdf, "k", "t", "id", tol)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val fwd = AsOfJoin.nextAsOf(ldf, rdf, "k", "t", "id", tol)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      left.foreach { l =>
        assert(back(l._3) == bruteBack(l), s"trial $trial back tol=$tol left=$l")
        assert(fwd(l._3) == bruteFwd(l), s"trial $trial fwd tol=$tol left=$l")
      }

      // strict (allowExactMatches = false) and nearest, same brute force
      def bruteBackS(l: (Long, Long, Long)): Option[(Long, Long)] =
        right.filter(r => r._1 == l._1 && r._2 < l._2 &&
            (tol < 0 || l._2 - r._2 <= tol))
          .sortBy(r => (-r._2, -r._3)).headOption.map(r => (l._2 - r._2, r._3))
      def bruteFwdS(l: (Long, Long, Long)): Option[(Long, Long)] =
        right.filter(r => r._1 == l._1 && r._2 > l._2 &&
            (tol < 0 || r._2 - l._2 <= tol))
          .sortBy(r => (r._2, r._3)).headOption.map(r => (r._2 - l._2, r._3))
      def bruteNearest(
          b: Option[(Long, Long)], f: Option[(Long, Long)]): Option[Long] =
        (b, f) match {
          case (Some((db, ib)), Some((df, _))) if db <= df => Some(ib) // backward wins ties
          case (_, Some((_, if_))) => Some(if_)
          case (Some((_, ib)), None) => Some(ib)
          case _ => None
        }
      def collectMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
        df.collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val backS = collectMap(AsOfJoin.latestAsOf(ldf, rdf, "k", "t", "id",
        tol, allowExactMatches = false))
      val fwdS = collectMap(AsOfJoin.nextAsOf(ldf, rdf, "k", "t", "id",
        tol, allowExactMatches = false))
      val near = collectMap(AsOfJoin.nearestAsOf(ldf, rdf, "k", "t", "id", tol))
      val nearS = collectMap(AsOfJoin.nearestAsOf(ldf, rdf, "k", "t", "id",
        tol, allowExactMatches = false))
      left.foreach { l =>
        assert(backS(l._3) == bruteBackS(l).map(_._2),
          s"trial $trial backStrict tol=$tol left=$l")
        assert(fwdS(l._3) == bruteFwdS(l).map(_._2),
          s"trial $trial fwdStrict tol=$tol left=$l")
        // inclusive nearest composes the INCLUSIVE candidates
        val bI = right.filter(r => r._1 == l._1 && r._2 <= l._2 &&
            (tol < 0 || l._2 - r._2 <= tol))
          .sortBy(r => (-r._2, -r._3)).headOption.map(r => (l._2 - r._2, r._3))
        val fI = right.filter(r => r._1 == l._1 && r._2 >= l._2 &&
            (tol < 0 || r._2 - l._2 <= tol))
          .sortBy(r => (r._2, r._3)).headOption.map(r => (r._2 - l._2, r._3))
        assert(near(l._3) == bruteNearest(bI, fI),
          s"trial $trial nearest tol=$tol left=$l")
        assert(nearS(l._3) == bruteNearest(bruteBackS(l), bruteFwdS(l)),
          s"trial $trial nearestStrict tol=$tol left=$l")
      }
    }
  }

  test("weightedPercentile equals a driver-side cumulative scan on random data") {
    import graft.operators.Stats
    val rnd = new Random(606)
    (1 to 4).foreach { trial =>
      val rows = Seq.fill(40 + rnd.nextInt(60))(
        (s"g${rnd.nextInt(3)}", (rnd.nextInt(2000) - 500) / 10.0,
          rnd.nextInt(9).toLong))
      val p = 1L + rnd.nextInt(999999).toLong
      val got = Stats.weightedPercentile(rows.toDF("g", "v", "w"),
          Seq("g"), "v", "w", p)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val wTotal = rs.map(_._3).sum
        val sorted = rs.map(r => (math.floor(r._2 * 10000).toLong / 1L, r._3))
          .map { case (x4, w) => (x4, w) }.sortBy(_._1)
        // cumulative weight where equal values form one step
        val byV = sorted.groupBy(_._1).view.mapValues(_.map(_._2).sum)
          .toSeq.sortBy(_._1)
        var cum = 0L
        val hit = byV.collectFirst {
          case (x4, w) if { cum += w; cum * 1000000L >= p * wTotal } => x4
        }
        (got.get(g), hit) match {
          case (Some((wt, pv)), Some(x4)) =>
            assert(wt == wTotal && pv == x4, s"trial $trial g=$g")
          case (None, None) => // all-zero-weight group both sides? not generated
          case other => fail(s"trial $trial g=$g mismatch: $other")
        }
      }
    }
  }

  test("targetEncodeLoo equals a driver-side held-out mean on random data") {
    import graft.operators.Encoding
    val rnd = new Random(707)
    (1 to 4).foreach { trial =>
      val rows = (1L to (30 + rnd.nextInt(40)).toLong).map { id =>
        (id,
          if (rnd.nextInt(10) == 0) null else s"k${rnd.nextInt(4)}",
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(100000) / 10.0))
      }
      val df = rows.toDF("id", "k", "y")
      val got = Encoding.targetEncodeLoo(df, "k", "y")
        .select("id", "n_key", "loo_e6").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      rows.foreach { case (id, k, y) =>
        val grp = rows.filter(_._2 == k)
        val ys = grp.flatMap(_._3)
          .map(v => math.floor(v * 10000 + 0.5).toLong) // decimal(14,4) HALF_UP
        val n = ys.size.toLong
        val want = y match {
          case Some(v) if n > 1 =>
            val y4 = math.floor(v * 10000 + 0.5).toLong
            Some((ys.sum - y4) * 100L / (n - 1))
          case None if n > 0 => Some(ys.sum * 100L / n)
          case _ => None
        }
        assert(got(id) == ((n, want)), s"trial $trial id=$id k=$k y=$y " +
          s"got=${got(id)} want=${(n, want)}")
      }
    }
  }

  test("quotaAdmit invariants: per-window counts, order stability, flag consistency") {
    import graft.operators.Behavior
    val rnd = new Random(808)
    (1 to 4).foreach { trial =>
      val rows = (1L to 200L).map(id =>
        (id, rnd.nextInt(5).toLong, rnd.nextInt(400).toLong))
      val q = 1 + rnd.nextInt(4)
      val win = 100L
      val got = Behavior.quotaAdmit(rows.toDF("id", "u", "ts"),
          "u", "ts", "id", win, q)
        .select("id", "u", "ts", "win", "seq", "admitted")
        .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
      assert(got.size == rows.size, "quota must not drop rows")
      got.groupBy(r => (r._2, r._4)).foreach { case ((u, w), g) =>
        val sorted = g.sortBy(r => (r._3, r._1))
        assert(sorted.map(_._5) == (1L to g.size.toLong), s"seq gap u=$u w=$w")
        assert(g.count(_._6) == math.min(q, g.size), s"admitted count u=$u")
        // admitted = exactly the first q by (ts, id)
        assert(sorted.take(q).forall(_._6) && sorted.drop(q).forall(!_._6))
        assert(g.forall(r => r._4 == r._3 / win))
      }
    }
  }
}
