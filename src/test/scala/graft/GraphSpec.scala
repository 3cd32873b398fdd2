package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Integer-scaled PageRank: hand-computed fixtures, symmetry, guards.
  * The q97 oracle replays full iterations; these cover the semantics
  * the fixture graph does not isolate.
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank on a 2-node cycle is exact and symmetric") {
    // A↔B: outdeg 1 each, every iteration maps rank -> base + 85%·rank;
    // by symmetry both nodes stay equal, and the fixpoint is scale
    // (mass-conserving cycle): 15e10 + 85e10 = 1e12 at every iteration
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000000000000L, 2L -> 1000000000000L), s"$got")
  }

  test("pageRank star graph: hub outranks leaves; dangling mass leaks") {
    // undirected star 0↔{1,2,3}: hub collects 3 leaf contributions
    val fwd = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val edges = fwd.union(fwd.select(col("dst"), col("src")))
    val undirected = Graph.pageRank(edges, iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(undirected(0L) > undirected(1L), s"hub must outrank: $undirected")
    assert(undirected(1L) == undirected(2L) && undirected(2L) == undirected(3L),
      "symmetric leaves must tie exactly")
    // directed-only version: leaves are dangling (no out-edges), so
    // their damped mass leaves the system instead of returning
    val directed = Graph.pageRank(fwd, iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(directed.values.sum < undirected.values.sum,
      "dangling leaves must leak total mass")
  }

  test("pageRank replayed one iteration matches the closed formula") {
    // path 1→2→3: after ONE iteration (scale 100, damping 50):
    //   base = 50; node 1: 50; node 2: 50 + 50·(100 div 1) div 100 = 100
    //   node 3: same as 2 (rank_0 uniform)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iterations = 1, dampingPct = 50,
        scale = 100L).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 50L, 2L -> 100L, 3L -> 100L), s"$got")
  }

  test("pageRank guards reject bad arguments; duplicate edges collapse") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(edges, iterations = 0))
    intercept[IllegalArgumentException](Graph.pageRank(edges, dampingPct = 101))
    intercept[IllegalArgumentException](Graph.pageRank(edges, scale = 10L))
    // the duplicate 1→2 edge must not double node 1's contribution:
    // identical to the 2-cycle fixture
    val got = Graph.pageRank(edges, iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000000000000L, 2L -> 1000000000000L), s"$got")
  }

  test("bfsLevels: hop distances, min-level rule, unreachable stays out") {
    // 1→2→3→4 chain + shortcut 1→3; 9→1 points INTO the source side
    // only; 7→8 is a disconnected island
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 1L),
      (7L, 8L)).toDF("src", "dst")
    val got = Graph.bfsLevels(edges, Seq(1L), maxDepth = 10)
      .as[(Long, Long)].collect().toMap
    // 3 via the shortcut at level 1, NOT level 2; 9 and 7,8 unreachable
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L), s"$got")
  }

  test("bfsLevels: maxDepth caps the search; multi-source takes min") {
    val chain = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("src", "dst")
    val capped = Graph.bfsLevels(chain, Seq(1L), maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L), s"$capped")
    // sources at both ends: node 3 is 2 from head, node 4 is 2 from tail
    val multi = Graph.bfsLevels(chain, Seq(1L, 6L), maxDepth = 10)
      .as[(Long, Long)].collect().toMap
    assert(multi(3L) == 2L && multi(4L) == 3L && multi(6L) == 0L, s"$multi")
  }

  test("kCore: chain peels away from a clique over multiple rounds") {
    // K4 on {1,2,3,4} + tail 4-5-6-7: the 3-core is exactly the K4;
    // at k=2 the tail peels over THREE rounds (7, then 6, then 5)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 3, rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"$core")
    // a 1-round budget peels only the first layer: 7 is gone, the rest
    // of the tail still present with its not-yet-final degrees
    val one = Graph.kCore(edges, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(!one.contains(7L) && one.contains(6L), s"$one")
    // fixpoint early-exit: a huge budget returns the same 2-core
    val conv = Graph.kCore(edges, k = 2, rounds = 50)
      .as[(Long, Long)].collect().toMap
    assert(conv == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"$conv")
    // duplicate/reversed edges and self-loops do not inflate degrees
    val noisy = (k4 ++ k4.map(_.swap) ++ Seq((1L, 1L))).toDF("src", "dst")
    val c2 = Graph.kCore(noisy, k = 3, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(c2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"$c2")
  }

  test("deterministicWalks: valid edges, sink stop, replica divergence, determinism") {
    // 1 and 2 point into each other and into 3; 3 is a SINK
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val walks = Graph.deterministicWalks(edges, walksPerNode = 4, steps = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byWalk = walks.groupBy(w => (w._1, w._2))
      .view.mapValues(_.sortBy(_._3).map(_._4).toList).toMap
    val edgeSet = Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L))
    byWalk.values.foreach { path =>
      path.sliding(2).foreach {
        case List(a, b) => assert(edgeSet.contains((a, b)),
          s"walk used a non-edge $a->$b in $path")
        case _ =>
      }
      // any walk that reached the sink stopped there
      if (path.last == 3L) assert(path.count(_ == 3L) == 1)
      else assert(path.length == 6, s"non-sink walk must run all steps: $path")
    }
    // starts: only nodes with outgoing edges, each with 4 replicas
    assert(byWalk.keySet.map(_._1) == Set(1L, 2L))
    assert(byWalk.keySet.size == 8)
    // replicas are not all identical (the draws are per (start, w, i))
    val fromOne = (0L to 3L).map(w => byWalk((1L, w)))
    assert(fromOne.distinct.size > 1, s"all replicas walked identically: $fromOne")
    // bit-for-bit deterministic across invocations
    val again = Graph.deterministicWalks(edges, walksPerNode = 4, steps = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(again.sorted == walks.sorted)
  }

  test("shortestPathsK: bounded Bellman-Ford relaxation, exact when converged") {
    // 1 -> 2 (w 5), 1 -> 3 (w 1), 3 -> 2 (w 1): best 1->2 is 2 via 3,
    // found only at round 2; 4 unreachable; 5 reaches nothing new
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L),
        (4L, 5L, 7L))
      .toDF("src", "dst", "w")
    val r1 = Graph.shortestPathsK(edges, Seq(1L), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 0L, 2L -> 5L, 3L -> 1L), r1.toString)
    val r2 = Graph.shortestPathsK(edges, Seq(1L), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 0L, 2L -> 2L, 3L -> 1L), r2.toString)
    // converged: extra rounds change nothing
    val r4 = Graph.shortestPathsK(edges, Seq(1L), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r4 == r2)
    // multi-source takes the min over sources
    val ms = Graph.shortestPathsK(edges, Seq(1L, 4L), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(ms(5L) == 7L && ms(2L) == 2L, ms.toString)
    // negative weight raises
    val neg = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    val e = intercept[Exception] {
      Graph.shortestPathsK(neg, Seq(1L), rounds = 1).collect()
    }
    assert(e.getMessage.contains("negative"), e.getMessage)
  }

  test("localClustering: square + diagonal, hand-computed ppm") {
    // square 1-2-3-4 with diagonal 1-3: triangles {1,2,3} and {1,3,4}
    // deg: 1:3, 2:2, 3:3, 4:2 -> per-node tri: 2,1,2,1
    // cc: 2/3, 1/1, 2/3, 1/1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val got = Graph.localClustering(edges)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    assert(got == Map(
      1L -> ((3L, 2L, Some(666666L))), 2L -> ((2L, 1L, Some(1000000L))),
      3L -> ((3L, 2L, Some(666666L))), 4L -> ((2L, 1L, Some(1000000L)))),
      got.toString)
    // a pendant node has no wedge -> null cc; duplicate/reversed edges
    // collapse before anything counts
    val withPendant = edges.union(Seq((5L, 1L), (1L, 5L)).toDF("src", "dst"))
    val p = Graph.localClustering(withPendant)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._5))).toMap
    assert(p(5L) == ((1L, None)), p.toString)
    assert(p(1L) == ((4L, Some(333333L))), p.toString) // 2 tri / 6 wedges
  }

  test("personalizedPageRank: mass restarts at seeds and decays out") {
    // path 1 -> 2 -> 3, seed {1}, one iteration:
    // seedBase = 3 * 1.5e11 div 1 = 4.5e11
    // r1(1) = 4.5e11; r1(2) = 85*4.5e11 div 100; r1(3) = 0
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.personalizedPageRank(edges, Seq(1L), iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 450000000000L, 2L -> 382500000000L, 3L -> 0L),
      r1.toString)
    // more iterations: mass reaches 3 but still decays with distance
    val r3 = Graph.personalizedPageRank(edges, Seq(1L), iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3(1L) > r3(2L) && r3(2L) > r3(3L) && r3(3L) > 0L, r3.toString)
    // seedless guard
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, Seq.empty)
    }
  }

  test("twoHopPairs: path/cycle counts; direct pairs and hubs excluded") {
    // path 1-2-3: (1,3) share middle 2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Graph.twoHopPairs(path).as[(Long, Long, Long)].collect()
    assert(p.toSeq == Seq((1L, 3L, 1L)), p.mkString(","))
    // square: (1,3) and (2,4) each via two middles
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val q = Graph.twoHopPairs(sq).as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(q == Map((1L, 3L) -> 2L, (2L, 4L) -> 2L), q.toString)
    // add the 1-3 diagonal: that pair is now DIRECT and drops out
    val dg = sq.union(Seq((1L, 3L)).toDF("src", "dst"))
    val d = Graph.twoHopPairs(dg).as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(!d.contains((1L, 3L)), d.toString)
    // hub exclusion: middle 2 in the path graph has degree 2 — cap 1
    // removes it and the (1,3) pair vanishes with it
    assert(Graph.twoHopPairs(path, maxMiddleDegree = 1L).count() == 0L)
  }

  test("assortativity: star is perfectly disassortative; regular null") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graph.assortativity(star).head()
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("assort_e6") == -1000000L, r.toString)
    // 4-cycle: every endpoint degree 2 -> zero variance -> null
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rc = Graph.assortativity(cyc).head()
    assert(rc.isNullAt(rc.fieldIndex("assort_e6")), rc.toString)
  }

  test("hits: one hand-computed iteration; L1 mass; determinism") {
    // 1->3, 2->3, 2->4: after one iteration (scale 1e6):
    //   a' = {3: 2e6, 4: 1e6}, total 3e6 -> a = {3: 666666, 4: 333333}
    //   h' = {1: 666666, 2: 999999}, total 1666665
    //     -> h = {1: 400000, 2: 600000} (both divisions exact)
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.hits(edges, iterations = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((400000L, 0L)), 2L -> ((600000L, 0L)),
      3L -> ((0L, 666666L)), 4L -> ((0L, 333333L))), got.toString)
    // more iterations keep the L1 mass ~scale on each side (floor-div
    // loses at most one unit per node) and stay deterministic
    val g3a = Graph.hits(edges, iterations = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val g3b = Graph.hits(edges.repartition(5), iterations = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(g3a.toSeq == g3b.toSeq, "partitioning changed HITS scores")
    val hubMass = g3a.map(_._2).sum
    val authMass = g3a.map(_._3).sum
    assert(hubMass > 1000000L - 4 && hubMass <= 1000000L, s"hub $hubMass")
    assert(authMass > 1000000L - 4 && authMass <= 1000000L,
      s"auth $authMass")
  }

  test("scc: multi-component fixture — cycles, bridge, singleton, self-loop") {
    // {1,2,3} cycle → bridge 3→4 → {4,5} cycle; 6→1 (6 is a singleton
    // source); 7→7 self-loop. Undirected CC would merge 1..6 into one
    // blob; SCC must keep four components.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 4L), (6L, 1L), (7L, 7L)).toDF("src", "dst")
    val got = Graph.stronglyConnectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 4L, 6L -> 6L, 7L -> 7L), got.toString)
    // partitioning-independent
    val got2 = Graph.stronglyConnectedComponents(edges.repartition(5))
      .as[(Long, Long)].collect().toMap
    assert(got2 == got)
  }

  test("dagLevels: longest-path levels; cycles raise instead of looping") {
    // diamond + tail: 1→2, 1→3, 2→4, 3→4, 4→5; level = longest path
    val dag = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.dagLevels(dag).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L),
      got.toString)
    // a cycle makes levels undefined: the budget raise must name it
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val e = intercept[Exception] { Graph.dagLevels(cyc, 8).collect() }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  test("scc: budgets raise loudly instead of splitting components") {
    // a 3-cycle needs 3 propagation rounds (2 label rounds + the
    // fixpoint-detection round): maxRounds = 2 must raise
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val e1 = intercept[Exception] {
      Graph.stronglyConnectedComponents(cyc, maxRounds = 2).collect()
    }
    assert(e1.getMessage.contains("did not converge"), e1.getMessage)
    // two chained SCCs need 2 phases: maxPhases = 1 must raise
    val chain = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val e2 = intercept[Exception] {
      Graph.stronglyConnectedComponents(chain, maxPhases = 1).collect()
    }
    assert(e2.getMessage.contains("unassigned"), e2.getMessage)
    // and with adequate budgets the same chain resolves exactly
    val ok = Graph.stronglyConnectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(ok == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L), ok.toString)
  }

  test("scc: constraint-propagation toggle never escapes to the " +
      "caller's session, even mid-run") {
    val cpKey = "spark.sql.constraintPropagation.enabled"
    assert(spark.conf.get(cpKey) == "true") // precondition
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    // a CONCURRENT reader polling the caller's session while SCC runs:
    // with the old same-session try/finally toggle this observed
    // "false" during the window; session isolation makes it impossible
    @volatile var observed = Set.empty[String]
    @volatile var poll = true
    val watcher = new Thread(() => {
      while (poll) { observed += spark.conf.get(cpKey); Thread.sleep(1) }
    })
    watcher.start()
    val got =
      try Graph.stronglyConnectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      finally { poll = false; watcher.join() }
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L), got.toString)
    assert(observed == Set("true"),
      s"caller session observed toggled conf values: $observed")
    assert(spark.conf.get(cpKey) == "true")
    // the cross-session temp views are cleaned up — nothing leaks into
    // the shared global-temp namespace
    assert(spark.sql("SHOW VIEWS IN global_temp").where(
      col("viewName").startsWith("graft_scc_")).count() == 0)
    // and the returned frame stays collectible AFTER the handoff views
    // are dropped (checkpoint-backed, no dangling view reference)
    assert(Graph.stronglyConnectedComponents(edges).count() == 4)
  }
}
