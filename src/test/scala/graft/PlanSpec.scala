package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards for the scale-critical properties
  * documented in SCALING.md: column pruning, filter pushdown, broadcast
  * joins, no Cartesian products on the LSH paths. These assert on
  * `explain` output at sf0.001 — plan SHAPE, not timing.
  */
class PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    Queries.all(q)(spark, sf).queryExecution.explainString(FormattedMode)

  test("q01: partial+final aggregation, pruned lineitem scan") {
    val p = plan("q01_agg_pricing")
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_returnflag:string,l_linestatus:string>"),
      s"lineitem scan not pruned to the 5 used columns:\n$p")
  }

  test("q02: dimension joins are broadcast, filters pushed to scans") {
    val p = plan("q02_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey)]"))
  }

  test("q09: semi join broadcast; region predicate pushed into the scan") {
    val p = plan("q09_semi_join")
    assert(p.contains("LeftSemi"))
    assert(p.contains("EqualTo(r_name,ASIA)"), "r_name filter not pushed down")
  }

  test("LSH dedup paths build no Cartesian product") {
    Seq("q18_dedup_minhash", "q20_dedup_ngram", "q19_dedup_simhash",
        "q25_embed_neardup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a Cartesian product")
    }
  }

  test("q36: tfidf carries no forced broadcast of the vocabulary table") {
    // the df (per-term document frequency) side is vocabulary-sized —
    // unbounded on a web corpus. AQE may still CHOOSE to broadcast it at
    // small SF; what must not exist is a mandatory hint in the plan.
    val analyzed = Queries.all("q36_tfidf_top")(spark, sf)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"tfidf plan carries a forced join hint:\n$analyzed")
  }

  test("q275/q277: the data-sized BM25 query forms carry NO forced " +
      "join hint anywhere (AQE owns every join against the relation)") {
    // the query relation is unbounded at 100 TB (millions of eval
    // prompts) — a mandatory broadcast hint on any query-derived
    // relation would OOM the build side; the plan must leave the
    // choice to AQE (the q36 posture, now for the pruned two-pass
    // ranked form too). The stats fold (one-row aggregates) and the
    // index save are exempt — this asserts the SEARCH plans only.
    val idx = graft.operators.TextAnalysis.textIndex(
      Tables.table(spark, sf, "documents"), "doc_id", "text")
    val queries = Tables.table(spark, sf, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id") % 21 === 3)
      .selectExpr("doc_id AS query_id", "text AS qtext")
    for ((name, df) <- Seq(
      "bm25TopKJoin-pruned" -> graft.operators.TextAnalysis.bm25TopKJoin(
        idx, queries, "query_id", "qtext", 5,
        maxScorePrune = Some(true)),
      "bm25ScreenJoin-pruned" -> graft.operators.TextAnalysis
        .bm25ScreenJoin(idx, queries, "query_id", "qtext",
          minScoreE6 = 2000000L, maxScorePrune = Some(true)))) {
      // the one legitimate hint shape: the broadcast of the ONE-ROW
      // corpus stats fold (crossJoin(broadcast(stats))). Tightened
      // (round-16 ADVICE): the hinted subtree's max output must be
      // PROVABLY one row — a collectFirst for a grouping-free
      // Aggregate anywhere below would also pass a forced broadcast
      // of a query-sized relation that merely CONTAINS the stats fold
      val hints = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      hints.foreach { h =>
        assert(h.child.maxRows.contains(1L),
          s"$name carries a forced hint on a relation not provably " +
            s"one row:\n$h")
      }
    }
  }

  test("q40: sessionize groupBy reuses the window's user partitioning") {
    // expected exchanges: ONE hash exchange feeding the window (the
    // (user, sid) aggregation is satisfied by user-hash partitioning,
    // so no second data shuffle) + the final range exchange for orderBy
    val p = plan("q40_sessionize")
    // formatted explain lists each node twice (tree + detail header);
    // count detail headers "(n) Exchange" so each node counts once
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"sessionize shuffles more than once before the sort:\n$p")
    assert(p.contains("Window"), "expected a window operator in the sessionize plan")
  }

  test("q12 assignment is a single narrow scan (no shuffle before sort)") {
    val p = plan("q12_kmodes_assign")
    // exactly one exchange: the final global orderBy; none before it
    val exchanges = "Exchange".r.findAllIn(p.replace("ReusedExchange", "")).size
    assert(exchanges <= 2, s"unexpected shuffles in assignment plan:\n$p")
    assert(p.contains("graft_hamming_assign") || p.contains("hamming"),
      "native assignment expression not in plan")
  }

  test("q56 frequency re-assignment is narrow: weights fold in as literals") {
    // FrequencyAssign runs its k×n weight aggregation eagerly at build
    // time; the REGISTERED plan must then be gate-narrow — one exchange
    // for the final orderBy, nothing data-sized shuffled for weights
    val p = plan("q56_kmodes_frequency")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"frequency assignment shuffles before the sort:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q58 corpus prep: gate prunes before the dedup exchange") {
    val p = plan("q58_corpus_prep")
    // expected: fingerprint-window exchange + lang aggregation exchange
    // + final sort exchange; the quality/language gate must NOT add one
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 3, s"corpus prep shuffles more than gate→dedup→agg:\n$p")
    assert(p.contains("text IS NOT NULL") || p.contains("isnotnull(text"),
      "null-text gate missing from the plan")
  }

  test("q59 stratified sample is one narrow filter before the sort") {
    val p = plan("q59_stratified_sample")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"hash sampling must not shuffle:\n$p")
  }

  test("q60 token budget: aggregation reuses the window's lang partitioning") {
    // one hash exchange feeding the per-lang window; the groupBy(lang)
    // is satisfied by the same partitioning; + the final sort exchange
    val p = plan("q60_token_budget")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"budget pack shuffles beyond window+sort:\n$p")
    assert(p.contains("Window"))
  }

  test("global-frame windows are provably bounded: q65 aggregate-grain, q60 stratified") {
    import org.apache.spark.sql.catalyst.plans.logical
    // q65's 7-day RANGE window has NO partition key — legal only
    // because its input is the day-grain AGGREGATE (row count bounded
    // by the calendar, not the data). Assert that bound in the plan
    // tree itself: every window without a partitionSpec must have an
    // Aggregate somewhere below it.
    val q65 = Queries.all("q65_rolling_revenue")(spark, sf)
      .queryExecution.optimizedPlan
    val q65Windows = q65.collect { case w: logical.Window => w }
    assert(q65Windows.nonEmpty, "q65 must plan a window")
    q65Windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collect { case a: logical.Aggregate => a }.nonEmpty,
        s"unpartitioned window must consume aggregate-grain input:\n$q65")
    }
    // q64's gap-fill windows carry the same calendar bound
    val q64 = Queries.all("q64_gap_fill")(spark, sf).queryExecution.optimizedPlan
    q64.collect { case w: logical.Window if w.partitionSpec.isEmpty => w }
      .foreach { w =>
        assert(w.child.collect { case a: logical.Aggregate => a }.nonEmpty,
          s"q64 unpartitioned window must consume aggregate-grain input:\n$q64")
      }
    // q60's cumulative-sum window is per-row, so it MUST be partitioned
    // (by the stratum key) — a global per-row window would funnel the
    // corpus through one task. row_number-based ops inherit this guard.
    val q60 = Queries.all("q60_token_budget")(spark, sf)
      .queryExecution.optimizedPlan
    val q60Windows = q60.collect { case w: logical.Window => w }
    assert(q60Windows.nonEmpty, "q60 must plan a window")
    q60Windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"budget-pack window must be stratum-partitioned, never global:\n$q60")
    }
  }

  test("q57 image decode stays a single narrow pass before the sort") {
    val p = plan("q57_image_decode")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"image decode shuffles before the sort:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"documents scan not pruned to doc_id:\n$p")
  }

  test("q61 HLL: pruned 2-column scan; state aggregation map-side combined") {
    val p = plan("q61_hll_distinct")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_returnflag:string>"),
      s"lineitem scan not pruned to the 2 used columns:\n$p")
    assert(p.contains("partial_max"),
      "HLL register aggregation is not map-side combined")
    assert(!p.contains("CartesianProduct"))
  }

  test("q93/q94: corpus side never shuffles into the rate/eval join") {
    // q93: the strata-rate table broadcasts onto the corpus (rates are
    // strata-sized); q94: the eval suite broadcasts into the score pass
    // (eval suites are small by nature) — a SortMergeJoin in either
    // means the full corpus moved for KB-sized metadata
    Seq("q93_mixture_sample", "q94_embed_decontaminate").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"), s"$q must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q shuffles the corpus against broadcast-sized metadata:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q builds a Cartesian:\n$p")
    }
  }

  test("q62/q63: sketch-side joins broadcast, never sort-merge") {
    Seq("q62_cm_heavy", "q63_bloom_prefilter").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q sketch join must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q shuffles a data-sized relation against a KB-sized sketch:\n$p")
    }
  }

  test("q64 gap fill: price predicate pushed to the orders scan") {
    val p = plan("q64_gap_fill")
    assert(p.contains("GreaterThan(o_totalprice,450000"),
      s"sparse-series filter not pushed to the parquet scan:\n$p")
  }

  test("q67 chunking is narrow: tokenize + explode, no shuffle before the sort") {
    val p = plan("q67_doc_chunks")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"chunking shuffles before the sort:\n$p")
    assert(p.contains("Generate"), "expected the sequence-explode Generate node")
  }

  test("q68 decontamination: equi-join on grams, never a Cartesian product") {
    val p = plan("q68_decontaminate")
    assert(!p.contains("CartesianProduct"), s"decontamination joins all-pairs:\n$p")
    assert(p.contains("partial_count"),
      "per-doc hit count is not map-side combined")
  }

  test("q70 release capstone: bounded post-checkpoint exchanges, no Cartesian") {
    // NOTE: pipelineRelease materializes the survivor set eagerly
    // (localCheckpoint), so building this plan RUNS the clean stage and
    // the counted plan starts from the checkpointed relation — the
    // guard covers the post-checkpoint stages only (gram agg + join,
    // anti join, lang agg, final sort; the clean stage's own shape is
    // guarded by q58's test). Measured shape: 7 exchanges.
    val p = plan("q70_pipeline_release")
    assert(!p.contains("CartesianProduct"), s"capstone joins all-pairs:\n$p")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 7, s"capstone shuffles more than its stages need ($exchanges):\n$p")
  }

  test("q73 interval join: bucketed equi-join, no Cartesian, pruned scan") {
    val p = plan("q73_interval_join")
    assert(!p.contains("CartesianProduct"), s"interval join went all-pairs:\n$p")
    // the candidate join must be a (key, bucket) equi-join — its exact
    // range predicate belongs in the join CONDITION, not a post-filter
    // over a cross product
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join found:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_shipdate:"),
      s"lineitem scan not pruned to the 5 used columns:\n$p")
  }

  test("q76 top-k aggregate: no WindowExec, partial buffers map-side combined") {
    val p = plan("q76_topk_agg")
    assert(!p.contains("Window"), s"top-k agg must not fall back to a window sort:\n$p")
    assert(p.contains("partial_graft_top_k"),
      s"top-k buffers are not combined before the exchange:\n$p")
  }

  test("q75 outliers: two-pass scan, moments map-side combined") {
    val p = plan("q75_group_outliers")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "group moments are not map-side combined")
    assert(!p.contains("CartesianProduct"))
  }

  test("q100 key skew: heavy keys via bounded agg; global window only on freq-of-freq") {
    val p = plan("q100_key_skew")
    assert(p.contains("graft_top_k"), "heavy keys must use the bounded aggregate")
    // the one unpartitioned window runs on the frequency-of-frequencies
    // table: m distinct counts need m(m+1)/2 <= N rows, so m <= sqrt(2N)
    // — its input is the AGGREGATE of an aggregate, never raw rows
    assert(!p.contains("row_number"), s"unexpected per-key window rank:\n$p")
  }

  test("q102 z-order scan: zone profiling is map-side combined, no joins on data") {
    val p = plan("q102_zorder_scan")
    assert(p.contains("partial_min") && p.contains("partial_count"),
      "zone profile must combine map-side")
    assert(!p.contains("SortMergeJoin"), s"zone arithmetic must not shuffle a join:\n$p")
  }

  test("q103 quality gate: the three row-local checks share ONE lineitem scan") {
    val p = plan("q103_quality_gate")
    // scans: 1 row-local + 1 unique + 1 ref fact side + 1 part dim = 4
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(scans <= 4, s"row-local checks are re-scanning the source ($scans):\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q104/q106/q110 behavior windows are all partitioned, never global") {
    import org.apache.spark.sql.catalyst.plans.logical
    Seq("q104_funnel", "q106_transitions", "q110_journey_paths").foreach { q =>
      val lp = Queries.all(q)(spark, sf).queryExecution.optimizedPlan
      val eventWindows = lp.collect { case w: logical.Window => w }
        // report-grain decorations (lag/first over the k-row step table)
        // sit above an Aggregate — those may be global by construction
        .filterNot(_.child.collect { case a: logical.Aggregate => a }.nonEmpty)
      assert(eventWindows.nonEmpty, s"$q expected an event-level window")
      eventWindows.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"$q has a global window over raw events:\n$lp")
        assert(w.partitionSpec.exists(_.toString.contains("user_id")),
          s"$q event window not partitioned by user_id:\n$lp")
      }
    }
  }

  test("q107 triangles: wedge/closing joins stay equi-joins") {
    val p = plan("q107_triangles")
    // the only Cartesians allowed are the two single-row report
    // decorations (sizes x wedge census); the data-sized joins must
    // all be hash/sort-merge equi-joins
    val cartesians = """\(\d+\) CartesianProduct""".r.findAllIn(p).size
    assert(cartesians <= 2, s"data-sized join went all-pairs ($cartesians):\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"wedge/closing joins must stay equi-joins:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join found:\n$p")
  }

  test("q109 interval merge: both windows and the span agg share one key shuffle") {
    val p = plan("q109_interval_merge")
    // one hash exchange on user_id feeds sort+windows+agg; the only
    // other exchange is the final presentation orderBy
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"interval merge re-shuffles its key ($exchanges):\n$p")
  }

  test("q113 BM25: bounded top-k aggregate, no window rank, term filter early") {
    val p = plan("q113_bm25_search")
    assert(p.contains("graft_top_k"),
      s"per-query top-k must use the bounded aggregate:\n$p")
    assert(!p.contains("row_number"), s"unexpected window rank:\n$p")
    // no data-sized all-pairs: the only nested-loop is the one-row
    // corpus-stats fold (q36's N rule)
    val cartesians = """\(\d+\) CartesianProduct""".r.findAllIn(p).size
    assert(cartesians == 0, s"BM25 planned a Cartesian product:\n$p")
  }

  test("q114 basket rules: pair fan-out is narrow, no self-join of baskets") {
    val p = plan("q114_basket_rules")
    assert(!p.contains("CartesianProduct"), s"all-pairs basket join:\n$p")
    // the quadratic step must be the array transform inside a project/
    // generate, not a join: exactly the basket agg + pair agg + item
    // decoration joins + final sort should shuffle
    assert(p.contains("Generate"), s"pair explode missing:\n$p")
  }

  test("q116 attribution: bucketed equi-pairing, conv-partitioned windows") {
    val p = plan("q116_attribution")
    assert(!p.contains("CartesianProduct"), s"touch pairing went all-pairs:\n$p")
    assert(p.contains("windowspecdefinition(conv_id#"),
      s"first/last resolution must be conv-partitioned:\n$p")
  }

  test("q120 PSI: the whole-report window rides on aggregate-grain input") {
    import org.apache.spark.sql.catalyst.plans.logical
    val q = Queries.all("q120_psi_drift")(spark, sf).queryExecution.optimizedPlan
    val windows = q.collect { case w: logical.Window => w }
    assert(windows.nonEmpty, "psi must plan the total window")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collect { case a: logical.Aggregate => a }.nonEmpty,
        s"unpartitioned window must consume aggregate-grain input:\n$q")
    }
  }

  test("q135 bloom prune: k broadcast semi-joins, never a fact-side shuffle join") {
    import org.apache.spark.sql.catalyst.plans.logical
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val lp = Queries.all("q135_bloom_join")(spark, sf)
      .queryExecution.optimizedPlan
    val semis = lp.collect {
      case j: logical.Join if j.joinType == LeftSemi => j }
    assert(semis.size == 3, s"expected the 3 per-hash semi-joins:\n$lp")
    semis.foreach(j => assert(
      j.hint.rightHint.exists(_.strategy.isDefined),
      s"bloom semi-join lost its broadcast hint (fact would shuffle):\n$lp"))
  }

  test("q134/q141/q142 feature-prep windows and sums stay group-partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical
    Seq("q141_rank_normalize", "q142_winsorize").foreach { q =>
      val lp = Queries.all(q)(spark, sf).queryExecution.optimizedPlan
      val ws = lp.collect { case w: logical.Window => w }
      assert(ws.nonEmpty, s"$q expected a window")
      ws.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$q planned a GLOBAL window over row-grain input:\n$lp"))
    }
    // target encoding: one partial+final aggregate, no window at all
    val te = plan("q134_target_encode")
    assert(te.contains("partial_count") || te.contains("partial_sum"),
      s"target encoding sums must combine map-side:\n$te")
    assert(!te.contains("Window"), s"target encoding must not sort rows:\n$te")
  }

  test("q144 point-in-time: union+window plan, no join node at fact grain") {
    val p = plan("q144_point_in_time")
    assert(p.contains("Union"), s"expected the as-of union trick:\n$p")
    // the only joins allowed are... none: scd2 + facts merge via Union,
    // the carry is a window — a Range/BroadcastNestedLoop join here
    // would be the fan-out plan this operator exists to avoid
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"point-in-time must not plan a range-join fan-out:\n$p")
  }

  test("q154/q155 policy/percentile windows stay group-partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical
    Seq("q154_quota_admit", "q155_weighted_median").foreach { q =>
      val lp = Queries.all(q)(spark, sf).queryExecution.optimizedPlan
      val ws = lp.collect { case w: logical.Window => w }
      assert(ws.nonEmpty, s"$q expected a window")
      ws.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$q planned a GLOBAL window over row-grain input:\n$lp"))
    }
  }

  test("round-5 additions: equi-joins only where the design says equi") {
    // k-means assignment joins on pos; bootstrap draws join on (group,
    // idx); two-hop wedges join on the middle — none of these may
    // degenerate into a Cartesian/nested-loop product
    Seq("q204_kmeans", "q188_bootstrap_ci", "q208_two_hop",
        "q203_prototype_eval").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q has a Cartesian product:\n$p")
    }
  }

  test("q195/q207 event windows stay user-partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical
    Seq("q195_dwell_time", "q207_clamped_balance").foreach { q =>
      val lp = Queries.all(q)(spark, sf).queryExecution.optimizedPlan
      val ws = lp.collect { case w: logical.Window => w }
      assert(ws.nonEmpty, s"$q expected a window")
      ws.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$q planned a GLOBAL window over row-grain input:\n$lp"))
    }
  }

  test("quantile sketch plans: partitioned windows only, no Cartesian product") {
    import org.apache.spark.sql.catalyst.plans.logical
    // the readout argmin window runs over the CAP-BOUNDED kept state,
    // partitioned by (group, q) — a global window over raw rows would
    // be the one-worker sort SCALING.md forbids. Same for the rolling
    // variant's window-merge path. (q232's group count is 5, so any
    // unpartitioned window here means the state plumbing regressed.)
    Seq("q232_quant_sketch", "q235_quant_merge", "q238_quant_rolling")
      .foreach { q =>
        val lp = Queries.all(q)(spark, sf).queryExecution.optimizedPlan
        val ws = lp.collect { case w: logical.Window => w }
        assert(ws.nonEmpty, s"$q expected a ranking window")
        ws.foreach(w => assert(w.partitionSpec.nonEmpty,
          s"$q planned a GLOBAL window:\n$lp"))
        val p = plan(q)
        assert(!p.contains("CartesianProduct"),
          s"$q has a Cartesian product")
      }
  }

  test("q237 video dedup: one narrow decode, no joins of the corpus against itself") {
    val p = plan("q237_video_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      s"q237 should dedup by signature aggregation, not a pair join:\n$p")
  }

  test("indexed screens (q245/q247/q249): banded/blocked equi-joins, never a Cartesian") {
    // the probe side of every persisted-index screen must candidate-
    // generate through its blocking equi-join (pigeonhole bands, sign
    // blocks, query-term postings); a CartesianProduct here would be
    // the all-pairs scan the indexes exist to avoid. (q249's one-row
    // corpus-stats broadcast plans as a BroadcastNestedLoopJoin by
    // design — a single-row broadcast, not a data×data product.)
    Seq("q245_media_index_load", "q247_vector_screen_indexed",
        "q249_bm25_screen_load").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q builds a Cartesian:\n$p")
    }
  }

  test("ingestText screen core: term equi-joins end to end, never a " +
      "Cartesian (batch side unhinted — AQE chooses)") {
    // q257/q258's verdicts ride localCheckpoint (plan pins through them
    // are vacuous — the PlanSpec convention), so pin the OPERATOR's
    // scoring core directly in its ingest configuration
    // (broadcastQueries = false: a data-sized batch must not be
    // force-broadcast). The one-row stats fold is a broadcast nested
    // loop by design; everything else joins on term/doc_id keys.
    import spark.implicits._
    val idx = graft.operators.TextAnalysis.textIndex(
      Seq((1L, "alpha beta gamma"), (2L, "gamma delta epsilon"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val qt = Seq((10L, "alpha"), (10L, "zeta"), (11L, "delta"))
      .toDF("query_id", "term")
    val p = graft.operators.TextAnalysis
      .bm25ScoredIndexed(idx, qt, 1.2, 0.75, broadcastQueries = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"text screen core builds a Cartesian:\n$p")
  }

  test("IndexStore.preBatchMatches: the one-row min fold plans as a " +
      "broadcast nested loop, never a Cartesian") {
    // The ingest rounds' replay-invariance filter crossJoins ONE
    // broadcast aggregate row (min batch id) into the screen output.
    // The registered ingest queries cannot pin this (their verdicts are
    // localCheckpoint-truncated before they surface), so pin the
    // operator's own plan directly: the single-row side must ride a
    // BroadcastNestedLoopJoin — a CartesianProduct would mean the
    // broadcast hint was lost and the screen output is being multiplied
    // against a distributed relation.
    import spark.implicits._
    val matches = Seq((1L, 5L, 0)).toDF("new_id", "corpus_id", "hamming")
    val batch = Seq((10L, 7L)).toDF("asset_id", "dh")
    val p = graft.operators.IndexStore
      .preBatchMatches(matches, batch, "asset_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected the min-row broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"), s"filter builds a Cartesian:\n$p")
  }
}
