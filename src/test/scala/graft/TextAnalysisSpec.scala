package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.col

/** [[TextAnalysis.vocabDiff]] — corpus snapshot vocabulary drift. */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("vocabDiff: statuses, ppm shares, minDf prune on the max side") {
    val olds = Seq((1L, "apple banana"), (2L, "apple cherry"),
      (3L, "apple")).toDF("doc_id", "text")
    val news = Seq((10L, "banana banana durian"), (11L, "banana durian"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabDiff(olds, news, "doc_id", "text",
        minDf = 2L)
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // apple: df 3 -> 0 over n=3/2 docs: shares 1e6 -> 0, vanished
    assert(got("apple") == ((3L, 0L, 1000000L, 0L, -1000000L, "vanished")))
    // banana: 1/3 -> 2/2: 333333 -> 1000000, grown (df counted per DOC,
    // not per occurrence: "banana banana" counts once)
    assert(got("banana") ==
      ((1L, 2L, 333333L, 1000000L, 666667L, "grown")))
    // durian: 0 -> 2, new
    assert(got("durian") == ((0L, 2L, 0L, 1000000L, 1000000L, "new")))
    // cherry: max(1, 0) < minDf -> pruned
    assert(!got.contains("cherry"), got.keys.toString)
  }

  test("greedyGenerate: argmax walk, lexicographic ties, dead-end stop") {
    // lang "en": "a b" x2, "a c" x1 -> seed = a (most frequent),
    // successor of a = b (count 2 > 1); b has no successor -> stop
    val docs = Seq(("en", "a b"), ("en", "a b"), ("en", "a c"),
      ("fr", "x y x y x")).toDF("lang", "text")
    val got = TextAnalysis.greedyGenerate(docs, "lang", "text", steps = 3)
      .as[(String, Long, String)].collect()
      .groupBy(_._1).map { case (l, rs) =>
        l -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got("en") == Seq("a", "b"), got.toString)
    // fr: x most frequent; x->y (2), y->x (2) -> alternates, full walk
    assert(got("fr") == Seq("x", "y", "x", "y"), got.toString)
  }

  /** Sorted row images — row order is layout, not semantics. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** 200 docs in 10 families of 20: every doc carries 10 universal
    * stopwords (df = 200, ub ≈ 5.5k) plus 3 family-shared terms
    * (df = 20, ub ≈ 5.0M) — the shape where the ranked MaxScore prune
    * provably has work to skip: a family query's θ lands in the
    * millions, so the stopwords' ascending-ub prefix is non-essential
    * and their 200-doc postings never reach the multiply.
    */
  private lazy val famDocs = (0L until 200L).map(i =>
    (i, "the of and to in a is for on with " +
      s"fam${i / 20}a fam${i / 20}b fam${i / 20}c")).toDF("doc_id", "text")

  test("bm25TopKIndexed maxScorePrune: lossless by bit-identity, and " +
      "the candidate set provably shrinks to the essential families") {
    val idx = TextAnalysis.textIndex(famDocs, "doc_id", "text")
    val queries = Seq(
      1L -> famDocs.where(col("doc_id") === 0L)
        .select("text").as[String].head(),
      2L -> famDocs.where(col("doc_id") === 55L)
        .select("text").as[String].head())
    for (k <- Seq(1, 5, 20, 50)) {
      val off = canon(TextAnalysis.bm25TopKIndexed(idx, queries, k))
      val on = canon(TextAnalysis.bm25TopKIndexed(idx, queries, k,
        maxScorePrune = true))
      assert(on == off, s"ranked prune must be lossless at k=$k")
    }
    // the proof the prune FIRES: two family queries at k=5 keep only
    // the two families' 40 docs as candidates, not all 200 matched
    val qt = queries.flatMap { case (qid, text) =>
      text.split(" ").distinct.map(t => (qid, t)) }.toDF("query_id", "term")
    val cands = TextAnalysis.topKCandidateDocs(idx, qt, k = 5,
      k1 = 1.2, b = 0.75)
    assert(cands.count() == 40L,
      "family queries at k=5 must prune candidates to the 2 families")
  }

  test("bm25TopKJoin: the data-sized query-relation form agrees " +
      "bit-for-bit with the driver-literal form, pruned and unpruned; " +
      "null-text queries drop; candidate shrink survives no-hint mode") {
    val idx = TextAnalysis.textIndex(famDocs, "doc_id", "text")
    val queries = Seq(
      1L -> famDocs.where(col("doc_id") === 0L)
        .select("text").as[String].head(),
      2L -> famDocs.where(col("doc_id") === 55L)
        .select("text").as[String].head(),
      3L -> "fam0a fam0b fam0c",
      4L -> "the of and",
      5L -> "zzz_unseen_term")
    val qDf = queries.toDF("qid", "qtext")
      .unionByName(Seq((9L, Option.empty[String]))
        .toDF("qid", "qtext")) // null text: no terms, no rows
    for (k <- Seq(1, 5, 25); prune <- Seq(false, true)) {
      val literal = canon(TextAnalysis.bm25TopKIndexed(idx, queries, k,
        maxScorePrune = prune))
      val joined = canon(TextAnalysis.bm25TopKJoin(idx, qDf,
        "qid", "qtext", k, maxScorePrune = Some(prune)))
      assert(joined == literal,
        s"join form must equal literal form at k=$k prune=$prune")
    }
    // the prune still FIRES with broadcastQueries off (AQE-only hints):
    // same 40-doc candidate set as the literal form's spec
    val qt = queries.take(2).flatMap { case (qid, text) =>
      text.split(" ").distinct.map(t => (qid, t)) }.toDF("query_id", "term")
    assert(TextAnalysis.topKCandidateDocs(idx, qt, k = 5,
      k1 = 1.2, b = 0.75, broadcastQueries = false).count() == 40L)
  }

  test("bm25ScreenJoin: the data-sized threshold screen agrees with " +
      "the driver-literal screen, pruned, unpruned, and with maxDfPpm") {
    val idx = TextAnalysis.textIndex(famDocs, "doc_id", "text")
    val queries = Seq(
      1L -> famDocs.where(col("doc_id") === 0L)
        .select("text").as[String].head(),
      2L -> "the of and",
      3L -> "zzz_unseen_term")
    val qDf = queries.toDF("qid", "qtext")
    for (prune <- Seq(false, true); ppm <- Seq(None, Some(200000L))) {
      val literal = canon(TextAnalysis.bm25ScreenIndexed(idx, queries,
        minScoreE6 = 1000000L, maxDfPpm = ppm, maxScorePrune = prune))
      val joined = canon(TextAnalysis.bm25ScreenJoin(idx, qDf,
        "qid", "qtext", minScoreE6 = 1000000L, maxDfPpm = ppm,
        maxScorePrune = Some(prune)))
      assert(joined == literal,
        s"screen join ≡ literal must hold at prune=$prune ppm=$ppm")
    }
  }

  test("auto maxScorePrune (ranked): the pre-flight statistic picks " +
      "PRUNE on a selective query relation and DIRECT on an " +
      "exhaustive one; auto output is bit-identical to both forced " +
      "sides either way") {
    val idx = TextAnalysis.textIndex(famDocs, "doc_id", "text")
    // selective: 2 family queries against 10 families — seeds cover
    // 40 of 200 docs, the stopword mass (10 × df=200 per query)
    // dominates totVol → prune
    val selQ = famDocs.where(col("doc_id").isin(0L, 55L))
      .selectExpr("doc_id AS qid", "text AS qtext")
    val selQt = TextAnalysis.queryTermsOf(selQ, "qid", "qtext")
    val (sv1, tv1, n1) = TextAnalysis.topKPruneStats(idx, selQt, 5, 1.2)
    assert(n1 == 200L && sv1 == 40L && tv1 == 4120L, s"($sv1, $tv1, $n1)")
    assert(TextAnalysis.autoPruneDecision(sv1, tv1, n1),
      "selective relation must decide PRUNE")
    // exhaustive: EVERY doc as its own query — seed volume alone
    // (20/query × 200 queries = 4000) dwarfs the 200-doc corpus, the
    // r15 failure shape → direct
    val allQ = famDocs.selectExpr("doc_id AS qid", "text AS qtext")
    val allQt = TextAnalysis.queryTermsOf(allQ, "qid", "qtext")
    val (sv2, tv2, n2) = TextAnalysis.topKPruneStats(idx, allQt, 5, 1.2)
    assert(sv2 == 4000L && n2 == 200L, s"($sv2, $tv2, $n2)")
    assert(!TextAnalysis.autoPruneDecision(sv2, tv2, n2),
      "exhaustive relation must decide DIRECT")
    // losslessness means auto ≡ forced(TRUE) ≡ forced(FALSE) at BOTH
    // shapes — whichever side auto picks, the rows cannot differ
    for (q <- Seq(selQ, allQ)) {
      val auto = canon(TextAnalysis.bm25TopKJoin(idx, q,
        "qid", "qtext", 5))
      assert(auto == canon(TextAnalysis.bm25TopKJoin(idx, q,
        "qid", "qtext", 5, maxScorePrune = Some(false))))
      assert(auto == canon(TextAnalysis.bm25TopKJoin(idx, q,
        "qid", "qtext", 5, maxScorePrune = Some(true))))
    }
  }

  test("auto maxScorePrune (threshold): essential-volume statistic " +
      "prunes at decontamination-grade thresholds, keeps the direct " +
      "multiply when everything is essential; auto ≡ forced") {
    val idx = TextAnalysis.textIndex(famDocs, "doc_id", "text")
    val selQ = famDocs.where(col("doc_id") === 0L)
      .selectExpr("doc_id AS qid", "text AS qtext")
    val qt = TextAnalysis.queryTermsOf(selQ, "qid", "qtext")
    // thr = 2e6: the stopword ascending-ub prefix (cum ≈ 55k) is
    // non-essential, essVol = the 3 family terms' 60 postings
    val (ev1, tv1, n1) =
      TextAnalysis.screenPruneStats(idx, qt, 2000000L, 1.2, None)
    assert(ev1 == 60L && tv1 == 2060L && n1 == 200L, s"($ev1, $tv1, $n1)")
    assert(TextAnalysis.autoPruneDecision(ev1, tv1, n1))
    // thr = 1: every matched term is essential (cum ≥ 1 from the first
    // ub) — the prune provably cuts nothing → direct
    val (ev2, tv2, _) =
      TextAnalysis.screenPruneStats(idx, qt, 1L, 1.2, None)
    assert(ev2 == tv2, s"($ev2, $tv2)")
    assert(!TextAnalysis.autoPruneDecision(ev2, tv2, n1))
    for (thr <- Seq(1L, 2000000L)) {
      val auto = canon(TextAnalysis.bm25ScreenJoin(idx, selQ,
        "qid", "qtext", minScoreE6 = thr))
      assert(auto == canon(TextAnalysis.bm25ScreenJoin(idx, selQ,
        "qid", "qtext", minScoreE6 = thr, maxScorePrune = Some(false))))
      assert(auto == canon(TextAnalysis.bm25ScreenJoin(idx, selQ,
        "qid", "qtext", minScoreE6 = thr, maxScorePrune = Some(true))))
    }
  }

  test("bm25TopKIndexed maxScorePrune edges: θ=0 (fewer than k " +
      "matches), all-stopword query, and unmatched query stay exact") {
    val idx = TextAnalysis.textIndex(famDocs, "doc_id", "text")
    val queries = Seq(
      1L -> "fam0a fam0b fam0c",        // 20 matches < k=25 → θ = 0
      2L -> "the of and",               // every doc matches, all tiny ubs
      3L -> "zzz_unseen_term")          // matches nothing — absent rows
    for (k <- Seq(3, 25)) {
      val off = canon(TextAnalysis.bm25TopKIndexed(idx, queries, k))
      val on = canon(TextAnalysis.bm25TopKIndexed(idx, queries, k,
        maxScorePrune = true))
      assert(on == off, s"edge queries must stay exact at k=$k")
      assert(!off.exists(_.startsWith("[3,")),
        "an unmatched query must emit no rows")
    }
  }

  test("gopherQuality: each rule flips on its own crafted doc; a " +
      "clean long doc passes; null text drops") {
    import org.apache.spark.sql.Row
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      // 1: 50 in-range words + 2 required stopwords -> pass
      (1L, fifty + " the of"),
      // 2: word count below 50 -> flag_word_count false
      (2L, "the of tiny doc"),
      // 3: symbol-heavy (#'s > words/10) -> flag_symbol_ratio false
      (3L, fifty + " the of # # # # # # # #"),
      // 4: 10 lines, 10 bullets -> flag_bullets false
      (4L, (1 to 10).map(i => s"- item $i the of").mkString("\n") +
        " " + fifty),
      // 5: every line ellipsis-ended -> flag_ellipsis false
      (5L, fifty + " the of ...\nsecond line ...\nthird ..."),
      // 6: numeric words (no alpha) beyond 20% -> flag_alpha false
      (6L, fifty.split(" ").take(30).mkString(" ") +
        " the of " + (1 to 20).map(_.toString * 2).mkString(" ")),
      // 7: no required stopwords -> flag_stopwords false
      (7L, fifty),
      (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(!got.contains(8L), "null text must drop")
    def flag(id: Long, f: String): Boolean = got(id).getAs[Boolean](f)
    assert(flag(1L, "pass"), got(1L).toString)
    assert(!flag(2L, "flag_word_count") && !flag(2L, "pass"))
    assert(!flag(3L, "flag_symbol_ratio") && !flag(3L, "pass"))
    assert(flag(1L, "flag_symbol_ratio"))
    assert(!flag(4L, "flag_bullets") && !flag(4L, "pass"))
    assert(!flag(5L, "flag_ellipsis") && !flag(5L, "pass"))
    assert(!flag(6L, "flag_alpha") && !flag(6L, "pass"))
    assert(!flag(7L, "flag_stopwords") && !flag(7L, "pass"))
    // the counts behind doc 1's pass, exactly
    assert(got(1L).getAs[Long]("n_words") == 52L)
    assert(got(1L).getAs[Long]("n_req_stopwords") == 2L)
    assert(got(1L).getAs[Long]("n_lines") == 1L)
  }

  test("vocabDiff: null text drops from counts and doc totals") {
    val olds = Seq((1L, "x y"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val news = Seq((3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabDiff(olds, news, "doc_id", "text",
        minDf = 1L)
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    // n_a = 1 (null-text doc excluded): share of x is 1e6, not 5e5
    assert(got("x") == 1000000L, got.toString)
  }
}
