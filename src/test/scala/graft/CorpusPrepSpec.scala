package graft

import graft.operators.{CorpusPrep, Sampling}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: deterministic sampling and token-budget
  * packing (the q59/q60 oracles check end-to-end values; these cover
  * the branches the fixtures do not reach).
  */
class CorpusPrepSpec extends SparkSuite {
  import spark.implicits._

  test("stripBoilerplateLines: cross-doc lines at df >= minDocs drop, " +
      "order and bytes survive, empty lines are formatting, " +
      "all-boilerplate docs stay with empty text") {
    val docs = Seq(
      (1L, "COPYRIGHT CORP\nalpha beta\n\n  copyright corp  \ntail one"),
      (2L, "copyright corp\ngamma delta\ntail two"),
      (3L, "copyright corp\ncopyright corp\nunique line"),
      (4L, "copyright corp"),
      (5L, ""),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // df("copyright corp") counts DISTINCT docs: 2,3,4 = 3 (doc 3's
    // repeat counts once; doc 1's variants differ by case/whitespace —
    // trim matches, case does NOT: "COPYRIGHT CORP" is a different key)
    val got = CorpusPrep
      .stripBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L),
      "null text drops; every other doc stays")
    val byId = got.map(r => r._1 -> r).toMap
    // doc 1: "  copyright corp  " trims to the boilerplate key and
    // drops despite its original padding; the empty line survives;
    // untrimmed bytes of kept lines survive
    assert(byId(1L) == ((1L, "COPYRIGHT CORP\nalpha beta\n\ntail one", 4L, 1L)),
      byId(1L).toString)
    assert(byId(2L) == ((2L, "gamma delta\ntail two", 2L, 1L)))
    assert(byId(3L) == ((3L, "unique line", 1L, 2L)))
    // all-boilerplate doc: stays, text "", full accounting
    assert(byId(4L) == ((4L, "", 0L, 1L)))
    // empty text = one empty line = formatting, kept verbatim
    assert(byId(5L) == ((5L, "", 1L, 0L)))
    // partition invariance (the df count and regroup are shuffles)
    val re = CorpusPrep
      .stripBoilerplateLines(docs.repartition(5), "doc_id", "text", 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(re == got, "partitioning changed the strip")
    // guards
    intercept[IllegalArgumentException] {
      CorpusPrep.stripBoilerplateLines(docs, "doc_id", "text", 1)
    }
  }

  test("dedupLinesWithinDoc: first occurrence survives in place, " +
      "trim-equal variants drop, formatting/empty lines always stay, " +
      "cross-doc repeats are untouched") {
    val docs = Seq(
      (1L, "nav bar\nreal content\n  nav bar  \n\nnav bar\ntail"),
      (2L, "nav bar\nother doc same line is fine"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = CorpusPrep.dedupLinesWithinDoc(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.head == ((1L, "nav bar\nreal content\n\ntail", 4L, 2L)),
      got.head.toString)
    // doc 2 keeps its own first "nav bar" — within-doc only
    assert(got(1) == ((2L, "nav bar\nother doc same line is fine", 2L, 0L)))
    // partition invariance
    val re = CorpusPrep
      .dedupLinesWithinDoc(docs.repartition(3), "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(re == got)
  }

  test("hashSample: deterministic, partition-invariant, rate-plausible") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 20).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 20)
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample membership must not depend on partitioning")
    assert(math.abs(a.size - 2000) < 150, s"got ${a.size} of ~2000")
    // distinct salts give (near-)independent samples
    val c = Sampling.hashSample(df, "id", 20, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(a != c)
    val overlap = a.intersect(c).size.toDouble / a.size
    assert(overlap > 0.1 && overlap < 0.35, s"overlap $overlap vs ~0.2")
  }

  test("stratifiedHashSample applies per-stratum rates with default fallback") {
    val df = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val got = Sampling.stratifiedHashSample(df, "lang", "id",
      rates = Map("en" -> 10), defaultPct = 80)
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") - 200) < 60, s"en ${byLang("en")} of ~200")
    assert(math.abs(byLang("de") - 1600) < 120, s"de ${byLang("de")} of ~1600")
  }

  test("temperatureSample: dominant keeps baseRate, tail boosted by sqrt, cap at 1") {
    // en 6400, de 1600, fr 100 → rates 0.5, 0.5*sqrt(4)=1 (capped from
    // exactly 1.0), 0.5*sqrt(64)=4 → capped 1
    val df = ((0 until 6400).map(i => (i.toLong, "en")) ++
      (10000 until 11600).map(i => (i.toLong, "de")) ++
      (20000 until 20100).map(i => (i.toLong, "fr")))
      .toDF("id", "lang")
    val got = Sampling.temperatureSample(df, "lang", "id", baseRate = 0.5)
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("de") == 1600L, "rate exactly 1 must keep every row")
    assert(byLang("fr") == 100L, "capped rate 1 must keep every row")
    assert(math.abs(byLang("en") - 3200) < 200, s"en ${byLang("en")} of ~3200")
    // deterministic: membership survives a repartition
    val again = Sampling.temperatureSample(df.repartition(7), "lang", "id",
      baseRate = 0.5).select("id").as[Long].collect().toSet
    assert(again == got.select("id").as[Long].collect().toSet)
    // guards
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(df, "lang", "id", baseRate = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(df.withColumn("__ts_rate", lit(1.0)),
        "lang", "id", baseRate = 0.5)
    }
  }

  test("exactKSample: exact size, rank order, short strata, partition-invariant") {
    val df = ((0 until 1000).map(i => (i.toLong, "en")) ++
      (5000 until 5003).map(i => (i.toLong, "de"))) // de has only 3 rows
      .toDF("id", "lang")
    val got = Sampling.exactKSample(df, "lang", "id", k = 10)
      .as[(String, Int, Long)].collect().toSeq
    val byLang = got.groupBy(_._1)
    assert(byLang("en").size == 10 && byLang("de").size == 3,
      "k rows per stratum; short strata return all rows")
    // ranks are 1..n and follow ascending hash order
    val hmap = df.select(col("id"),
        graft.functions.PortableHash.hash60(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    Seq("en", "de").foreach { l =>
      val rows = byLang(l).sortBy(_._2)
      assert(rows.map(_._2) == (1 to rows.size))
      val hashes = rows.map { case (_, _, id) => hmap(id).toDouble }
      assert(hashes == hashes.sorted, s"$l ranks must follow hash order")
    }
    val again = Sampling.exactKSample(df.repartition(7), "lang", "id", k = 10)
      .as[(String, Int, Long)].collect().toSeq
    assert(again.toSet == got.toSet, "membership independent of partitioning")
  }

  test("packSequences: boundary split, conservation, per-stratum layout") {
    // en stream: 60 + 50 + 100 tokens, ctx 64 →
    //   doc 1 [0,60) ex0; doc 2 [60,110) ex0+ex1; doc 3 [110,210) ex1-3
    val docs = Seq(
      (1L, "en", 60L), (2L, "en", 50L), (3L, "en", 100L),
      (10L, "de", 64L),          // exactly one full example
      (11L, "de", 0L))           // empty doc: occupies no stream space
      .toDF("doc_id", "lang", "n")
    val got = CorpusPrep.packSequences(docs, "lang", "doc_id", "n", ctxLen = 64L)
      .orderBy("lang", "example_id")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("de", 0L, 1L, 64L, 10L, 10L),
      ("en", 0L, 2L, 64L, 1L, 2L),   // doc 2 split across ex0/ex1
      ("en", 1L, 2L, 64L, 2L, 3L),   // tail of doc 2 + head of doc 3
      ("en", 2L, 1L, 64L, 3L, 3L),
      ("en", 3L, 1L, 18L, 3L, 3L)),  // last example holds the remainder
      s"got $got")
    // conservation: packed token totals equal the input stream totals
    assert(got.filter(_._1 == "en").map(_._4).sum == 210L)
    assert(got.filter(_._1 == "de").map(_._4).sum == 64L)
  }

  test("packByBudget: inclusive prefix cut, priority order, admitFirst branch") {
    val docs = Seq(
      // lang en: priorities 9,8,7 with tokens 50,40,30 — budget 100
      // admits 9 (50) and 8 (90) but not 7 (120)
      (1L, "en", 50L, 9.0), (2L, "en", 40L, 8.0), (3L, "en", 30L, 7.0),
      // lang de: the single best doc alone exceeds the budget
      (4L, "de", 500L, 9.0), (5L, "de", 60L, 8.0))
      .toDF("doc_id", "lang", "n_tokens", "quality")
    val strict = CorpusPrep.packByBudget(docs, "lang", "quality", "doc_id",
        "n_tokens", 100L).select("doc_id").as[Long].collect().toSet
    assert(strict == Set(1L, 2L), s"strict pack got $strict")
    val lenient = CorpusPrep.packByBudget(docs, "lang", "quality", "doc_id",
        "n_tokens", 100L, admitFirst = true)
      .select("doc_id").as[Long].collect().toSet
    // de's oversized best doc is admitted; its runner-up still is not
    assert(lenient == Set(1L, 2L, 4L), s"admitFirst pack got $lenient")
  }

  test("packByBudget ties on priority break by id — deterministic membership") {
    val docs = (0 until 10).map(i => (i.toLong, "en", 10L, 1.0))
      .toDF("doc_id", "lang", "n_tokens", "quality")
    val got = CorpusPrep.packByBudget(docs, "lang", "quality", "doc_id",
        "n_tokens", 45L).select("doc_id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L, 3L), s"got $got") // ids 0-3 = 40 tokens
  }

  test("weightedHashSample: keep rate tracks the weight; edges clamp") {
    val df = spark.range(8000).toDF("id")
      .withColumn("p", when(col("id") % 4 === 0, 0.0)
        .when(col("id") % 4 === 1, 0.25)
        .when(col("id") % 4 === 2, 0.75).otherwise(1.0))
    val kept = Sampling.weightedHashSample(df, "id", col("p"))
    val byP = kept.groupBy("p").count().as[(Double, Long)].collect().toMap
    assert(!byP.contains(0.0), "p=0 rows must never be kept")
    assert(byP(1.0) == 2000L, "p=1 rows must all be kept")
    assert(math.abs(byP(0.25) - 500) < 120, s"p=.25 kept ${byP(0.25)} of ~500")
    assert(math.abs(byP(0.75) - 1500) < 120, s"p=.75 kept ${byP(0.75)} of ~1500")
    // deterministic: same rows on a different partitioning
    val again = Sampling.weightedHashSample(df.repartition(7), "id", col("p"))
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("splitColumn: exhaustive, disjoint, stable proportions") {
    val df = spark.range(10000).toDF("id")
    val got = df.select(col("id"),
        Sampling.splitColumn(col("id"), Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("s"))
    val counts = got.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"), s"got ${counts.keySet}")
    assert(counts.values.sum == 10000, "every row gets exactly one split")
    assert(math.abs(counts("train") - 8000) < 300)
    assert(math.abs(counts("val") - 1000) < 150)
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 50, "b" -> 40))
    }
  }

  test("foldColumn: exhaustive, balanced, salt-independent of splits") {
    val df = spark.range(10000).toDF("id")
    val folds = df.select(Sampling.foldColumn(col("id"), 5).as("f"))
      .groupBy("f").count().as[(Int, Long)].collect().toMap
    assert(folds.keySet == (0 until 5).toSet, "every fold non-empty")
    assert(folds.values.sum == 10000, "each row in exactly one fold")
    folds.values.foreach(n => assert(math.abs(n - 2000) < 300, s"$folds"))
    // a different salt reshuffles membership (folds aren't split slices)
    val moved = df.select(
        Sampling.foldColumn(col("id"), 5).as("a"),
        Sampling.foldColumn(col("id"), 5, salt = "fold2").as("b"))
      .where(col("a") =!= col("b")).count()
    assert(moved > 5000, s"expected most rows to move under a new salt: $moved")
    intercept[IllegalArgumentException] { Sampling.foldColumn(col("id"), 1) }
  }

  test("leakProofSplit: near-dup pairs co-split; singletons match splitColumn") {
    // pair graph: {1,2,3} chained, {10,11} — 4,5 isolated
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val got = Sampling.leakProofSplit(docs, "doc_id", pairs, splits)
      .select("doc_id", "rep_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // every member of a dup group shares the representative AND the split
    assert(Seq(1L, 2L, 3L).map(got(_)).distinct.size == 1)
    assert(Seq(10L, 11L).map(got(_)).distinct.size == 1)
    assert(got(1L)._1 == 1L && got(10L)._1 == 10L, "rep = smallest member id")
    // isolated docs keep their own id and exactly splitColumn's verdict
    val plain = docs.select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"), splits).as("s"))
      .as[(Long, String)].collect().toMap
    Seq(4L, 5L).foreach { id =>
      assert(got(id) == ((id, plain(id))))
    }
    // empty pair list degrades to splitColumn for EVERY doc
    val noPairs = Sampling.leakProofSplit(docs, "doc_id",
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(noPairs == plain)
    // a corpus carrying its own group_id column must pass through intact
    val withGid = Seq((1L, 7L), (2L, 8L)).toDF("doc_id", "group_id")
    val kept = Sampling.leakProofSplit(withGid, "doc_id", pairs, splits)
      .select("doc_id", "group_id").as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 7L, 2L -> 8L))
    // pre-existing output columns fail loudly instead of being clobbered
    intercept[IllegalArgumentException] {
      Sampling.leakProofSplit(Seq((1L, "x")).toDF("doc_id", "split"),
        "doc_id", pairs, splits)
    }
  }

  test("chunk: windows cover every token exactly once modulo overlap") {
    // 95 tokens, 50-token chunks, 10 overlap (step 40) -> starts 0,40,80
    val text = (1 to 95).map(i => s"t$i").mkString(" ")
    val rows = CorpusPrep.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 50, overlap = 10)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_len").as[(Long, Int)].collect().toSeq
    assert(rows == Seq((0L, 50), (1L, 50), (2L, 15)), s"got $rows")
    // chunk lengths sum = n + overlap * (n_chunks - 1): full coverage,
    // each interior boundary counted twice
    assert(rows.map(_._2).sum == 95 + 10 * (rows.size - 1))
  }

  test("chunk edge cases: short doc = one chunk; empty/null docs = none") {
    val df = Seq(
      (1L, "only five little tokens here"),
      (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, (1 to 50).map(_.toString).mkString(" ")) // exactly one full window
    ).toDF("doc_id", "text")
    val got = CorpusPrep.chunk(df, "doc_id", "text", 50, 10)
      .select("id", "chunk_len").as[(Long, Int)].collect().toSeq.sorted
    assert(got == Seq((1L, 5), (4L, 50)), s"got $got")
  }

  test("chunk fingerprints re-derive the original document") {
    // distinct tokens => distinct shingle fingerprints per chunk; the
    // overlap region must appear at the tail of chunk i and the head of
    // chunk i+1 (context continuity, the property training relies on)
    val toks = (1 to 90).map(i => s"w$i")
    val rows = CorpusPrep.chunk(Seq((7L, toks.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", 50, 10).orderBy("chunk_idx").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(0).getAs[String]("chunk_fp") == fp(toks.take(50).mkString(" ")))
    assert(rows(1).getAs[String]("chunk_fp") == fp(toks.slice(40, 90).mkString(" ")))
  }

  test("walkForwardFolds: train strictly past, embargo gap dropped, horizon bounded") {
    // events at t = 0..9 (ts in abstract units)
    val df = (0L to 9L).map(t => (t, t)).toDF("id", "ts")
    // fold i origin = 0 + 3 + i*2 -> O0=3, O1=5; embargo 1, horizon 2
    val got = Sampling.walkForwardFolds(df, "ts", nFolds = 2,
        trainMin = 3, step = 2, horizon = 2, embargo = 1)
      .select("fold", "role", "id").as[(Long, String, Long)]
      .collect().toSet
    val want =
      (0L to 2L).map(t => (0L, "train", t)).toSet ++
        Seq((0L, "test", 4L), (0L, "test", 5L)) ++       // [4, 6); 3 embargoed
        (0L to 4L).map(t => (1L, "train", t)).toSet ++
        Seq((1L, "test", 6L), (1L, "test", 7L))          // [6, 8); 5 embargoed
    assert(got == want, s"got $got")
    // zero embargo: the origin row itself is the first test row
    val ne = Sampling.walkForwardFolds(df, "ts", nFolds = 1,
        trainMin = 3, step = 2, horizon = 1, embargo = 0)
      .select("role", "id").as[(String, Long)].collect().toSet
    assert(ne == ((0L to 2L).map(("train", _)).toSet + (("test", 3L))), s"$ne")
    assert(Sampling.walkForwardFolds(df.limit(0), "ts", 2, 3, 2, 2).count() == 0)
  }

  test("negativeSamples: positives/self excluded, deterministic, rank contract") {
    // anchors ARE pool members (10, 11) so self-exclusion is exercised
    val pos = Seq((10L, 12L), (10L, 13L), (11L, 12L)).toDF("a", "p")
    val pool = (10L to 29L).toDF("item")
    val got = Sampling.negativeSamples(pos, pool, "a", "p", "item",
        k = 4, draws = 12)
      .as[(Long, Long, Long)].collect().toSeq
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.keySet == Set(10L, 11L))
    val posMap = Map(10L -> Set(12L, 13L), 11L -> Set(12L))
    got.foreach { case (a, _, neg) =>
      assert(!posMap(a).contains(neg), s"positive $neg sampled for $a")
      assert(neg != a, s"anchor $a sampled itself")
      assert((10L to 29L).contains(neg), "negative must come from the pool")
    }
    byAnchor.values.foreach { rows =>
      assert(rows.map(_._2).sorted == (1L to rows.size.toLong), "dense ranks")
      assert(rows.size <= 4)
      assert(rows.map(_._3).distinct.size == rows.size, "duplicate negative")
    }
    val again = Sampling.negativeSamples(pos, pool, "a", "p", "item",
        k = 4, draws = 12)
      .as[(Long, Long, Long)].collect().toSeq
    assert(again.toSet == got.toSet, "sampling must be deterministic")
    // different salt -> (almost surely) different draws
    val salted = Sampling.negativeSamples(pos, pool, "a", "p", "item",
        k = 4, draws = 12, salt = "other")
      .as[(Long, Long, Long)].collect().toSeq
    assert(salted.toSet != got.toSet)
  }
}
