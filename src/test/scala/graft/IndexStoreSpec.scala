package graft

import graft.operators.{Dedup, IndexStore, IvfIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Index persistence lifecycle (IndexStore): load(save(x)) probes
  * identically to an inline-built index, and APPEND ≡ REBUILD — the
  * invariant that makes build-once-probe-forever safe at 100 TB.
  */
class IndexStoreSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_idxspec").toString

  private val rnd = new Random(91)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private def sentence(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** Old corpus (ids 0-19, with an internal exact-dup pair) and a new
    * batch (ids 100-104) containing: an exact dup of an old text, an
    * exact dup WITHIN the batch, a near-dup of an old text, and novel
    * text — every append merge case.
    */
  private lazy val (oldDocs, newDocs) = {
    val base = (0 until 18).map(i => (i.toLong, sentence(30)))
    val old = base ++ Seq((18L, base(3)._2), (19L, base(3)._2))
    val nearOld = {
      val w = base(5)._2.split(" "); w(10) = "CHANGED"; w.mkString(" ")
    }
    val neu = Seq(
      (100L, base(7)._2),   // exact dup of old rep 7
      (101L, sentence(30)), // novel
      (102L, nearOld),      // near-dup of old 5 (novel TEXT → new group)
      (103L, sentence(30)), // novel
      (104L, base(7)._2))   // exact dup of old rep 7, same batch as 100
    (old.toDF("doc_id", "text"), neu.toDF("doc_id", "text"))
  }

  /** Canonical table image: sorted row renderings (row order in parquet
    * is layout, not semantics).
    */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Resolves through the generation manifest, so it reads the ACTIVE
    * generation before and after a compaction alike.
    */
  private def canonIndex(path: String, tables: Seq[String]): Map[String, Seq[String]] =
    tables.map(t =>
      t -> canon(spark.read.parquet(IndexStore.tableDir(spark, path, t)))).toMap

  test("corpus index: append equals rebuild, table for table and probe for probe") {
    val appended = tmp(); val rebuilt = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", appended)
    IndexStore.appendCorpusIndex(newDocs, "doc_id", "text", appended)
    IndexStore.saveCorpusIndex(oldDocs.unionByName(newDocs), "doc_id", "text", rebuilt)
    val ts = Seq("bands", "sets", "members")
    assert(canonIndex(appended, ts) == canonIndex(rebuilt, ts),
      "appended index tables must equal a from-scratch rebuild")
    // and the probe surface agrees with the never-persisted operator
    val probe = Seq((900L, oldDocs.as[(Long, String)].collect()(2)._2),
      (901L, sentence(30))).toDF("doc_id", "text")
    val viaLoaded = Dedup.minhashLSHJoinIndexed(probe,
        IndexStore.loadCorpusIndex(spark, appended), "doc_id", "text")
      .orderBy("new_id", "corpus_id")
    val inline = Dedup.minhashLSHJoin(probe, oldDocs.unionByName(newDocs),
        "doc_id", "text")
      .orderBy("new_id", "corpus_id")
    assert(viaLoaded.collect().toSeq == inline.collect().toSeq)
    assert(viaLoaded.count() > 0, "probe fixture must actually match something")
  }

  test("corpus index: append merges exact-dup members under the existing rep") {
    val path = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", path)
    IndexStore.appendCorpusIndex(newDocs, "doc_id", "text", path)
    val members = spark.read.parquet(s"$path/members")
      .as[(Long, Long)].collect().toSet
    // 100 and 104 duplicate old doc 7's text → file under rep 7
    assert(members.contains((7L, 100L)) && members.contains((7L, 104L)))
    // near-dup text is a NEW group (exact merge only)
    assert(members.contains((102L, 102L)))
  }

  test("corpus index: non-monotone append raises") {
    val path = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", path)
    val clash = Seq((5L, sentence(20))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendCorpusIndex(clash, "doc_id", "text", path)
    }
    assert(e.getMessage.contains("monotone"))
  }

  test("corpus index: kind mismatch raises") {
    val path = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", path)
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadVectorIndex(spark, path)
    }
    assert(e.getMessage.contains("expected 'vector'"))
  }

  // deterministic little embedding fixture: 3 clusters of near-parallel
  // vectors + exact duplicates across the old/new split
  private def vec(c: Int, j: Int): Seq[Double] =
    (0 until 8).map(d => (if (d % 3 == c) 4.0 else 0.5) + j * 0.01)
  private lazy val oldVecs = (0 until 12)
    .map(i => (i.toLong, vec(i % 3, i / 3))).toDF("vec_id", "embedding")
  private lazy val newVecs = Seq(
    (100L, vec(0, 0)),  // exact dup of old vec 0
    (101L, vec(1, 9)),  // novel, cluster 1
    (102L, vec(2, 9)))  // novel, cluster 2
    .toDF("vec_id", "embedding")

  test("vector index: append equals rebuild; loaded lshTopK matches inline") {
    val appended = tmp(); val rebuilt = tmp()
    IndexStore.saveVectorIndex(oldVecs, "vec_id", "embedding", appended, dim = 8)
    IndexStore.appendVectorIndex(newVecs, "vec_id", "embedding", appended)
    IndexStore.saveVectorIndex(oldVecs.unionByName(newVecs), "vec_id",
      "embedding", rebuilt, dim = 8)
    val ts = Seq("blocks", "reps", "members")
    assert(canonIndex(appended, ts) == canonIndex(rebuilt, ts))
    val queries = oldVecs.where(col("vec_id") < 3)
    val viaLoaded = Similarity.lshTopKIndexed(
        IndexStore.loadVectorIndex(spark, appended), queries,
        "vec_id", "embedding", dim = 8, k = 3)
      .orderBy("query_id", "rank")
    val inline = Similarity.lshTopK(oldVecs.unionByName(newVecs), queries,
        "vec_id", "embedding", dim = 8, k = 3)
      .orderBy("query_id", "rank")
    assert(viaLoaded.collect().toSeq == inline.collect().toSeq)
    assert(viaLoaded.count() > 0)
  }

  test("ivf: load(save) round-trips; append assigns with frozen centroids") {
    val path = tmp()
    val model = IvfIndex.build(oldVecs, "vec_id", "embedding", nLists = 3,
      trainFraction = 1.0)
    IndexStore.saveIvf(model, path)
    val loaded = IndexStore.loadIvf(spark, path)
    assert(loaded.centroids.map(_.toSeq).toSeq == model.centroids.map(_.toSeq).toSeq)
    assert(canon(loaded.assignments) == canon(model.assignments))
    IndexStore.appendIvf(newVecs, "vec_id", "embedding", path)
    val after = IndexStore.loadIvf(spark, path)
    // append ≡ assigning the full corpus against the SAME centroids
    val full = oldVecs.unionByName(newVecs)
    val expected = IvfIndex.assign(full, "vec_id", "embedding", model.centroids)
    assert(canon(after.assignments) == canon(expected))
    // and search over the appended index equals search with that model
    val got = IvfIndex.search(after, full, full.where(col("vec_id") < 2),
        "vec_id", "embedding", k = 3, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val want = IvfIndex.search(IvfIndex.Model(model.centroids, expected), full,
        full.where(col("vec_id") < 2), "vec_id", "embedding", k = 3, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("ivf: appending an existing id raises") {
    val path = tmp()
    IndexStore.saveIvf(
      IvfIndex.build(oldVecs, "vec_id", "embedding", nLists = 2,
        trainFraction = 1.0), path)
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendIvf(oldVecs.limit(1), "vec_id", "embedding", path)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("text index: append equals rebuild; loaded bm25 matches inline") {
    import graft.operators.TextAnalysis
    val all = oldDocs.unionByName(newDocs)
    val appended = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", appended)
    IndexStore.appendTextIndex(newDocs, "doc_id", "text", appended)
    val rebuilt = tmp()
    IndexStore.saveTextIndex(all, "doc_id", "text", rebuilt)
    assert(canonIndex(appended, Seq("postings", "doclen")) ==
      canonIndex(rebuilt, Seq("postings", "doclen")),
      "appended text index must equal a from-scratch rebuild")
    val queries = Seq(1L -> "alpha beta", 2L -> "kappa zeta CHANGED")
    val inline = canon(TextAnalysis.bm25TopK(all, "doc_id", "text", queries, 5))
    val loaded = canon(TextAnalysis.bm25TopKIndexed(
      IndexStore.loadTextIndex(spark, appended), queries, 5))
    assert(loaded == inline && inline.nonEmpty,
      "persisted-index probe must match the inline build")
  }

  test("text index: torn append (doclen without postings) raises at load") {
    val path = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", path)
    // simulate: appendTextIndex wrote doclen, crashed before postings —
    // the stranded rows inflate N/avgdl for every future score
    Seq((50L, 30L)).toDF("doc_id", "dl")
      .write.mode("append").parquet(s"$path/doclen")
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadTextIndex(spark, path)
    }
    assert(e.getMessage.contains("torn") && e.getMessage.contains("postings"),
      e.getMessage)
    IndexStore.loadTextIndex(spark, path, check = false): Unit
  }

  test("repairTextIndex: detect → repair → load green; repaired scores " +
      "equal an index built without the orphaned docs; pruned ids stay " +
      "retired under the monotone guard") {
    import graft.operators.TextAnalysis
    val path = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", path)
    // torn append: doclen rows landed, postings never did
    Seq((50L, 30L), (51L, 12L)).toDF("doc_id", "dl")
      .write.mode("append").parquet(s"$path/doclen")
    intercept[IllegalArgumentException] { IndexStore.loadTextIndex(spark, path) }
    assert(IndexStore.repairTextIndex(spark, path) == 2L,
      "repair must report both pruned orphans")
    val repaired = IndexStore.loadTextIndex(spark, path) // green again
    // repaired index ≡ one that never saw the torn docs, probe for probe
    val clean = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", clean)
    val queries = Seq(1L -> "alpha beta", 2L -> "kappa zeta")
    val viaRepaired = canon(TextAnalysis.bm25TopKIndexed(repaired, queries, 5))
    val viaClean = canon(TextAnalysis.bm25TopKIndexed(
      IndexStore.loadTextIndex(spark, clean), queries, 5))
    assert(viaRepaired == viaClean && viaClean.nonEmpty,
      "pruning must restore exact idf/avgdl")
    // a second repair is a no-op
    assert(IndexStore.repairTextIndex(spark, path) == 0L)
    // pruned ids are NOT freed: they sort below the surviving max only
    // if older — here 50/51 were the max, so re-appending id 50 would
    // pass the monotone guard ONLY with a fresh-enough id; an id at or
    // below the surviving max still raises
    intercept[IllegalArgumentException] {
      IndexStore.appendTextIndex(oldDocs.limit(1), "doc_id", "text", path)
    }
    // and the lifecycle continues: a fresh-id append lands in the
    // repaired (new-generation) doclen
    IndexStore.appendTextIndex(newDocs, "doc_id", "text", path)
    assert(canonIndex(path, Seq("postings", "doclen")) == {
      val full = tmp()
      IndexStore.saveTextIndex(oldDocs.unionByName(newDocs),
        "doc_id", "text", full)
      canonIndex(full, Seq("postings", "doclen"))
    }, "append-after-repair ≡ rebuild without the orphans")
  }

  test("rebuildIvf: retrain+reassign ≡ fresh build over the same corpus; " +
      "published atomically next to a pinned reader") {
    val path = tmp()
    // stale model: trained on cluster-0-heavy prefix, then appends
    // drifted the corpus — the documented IVF decay scenario
    IndexStore.saveIvf(
      IvfIndex.build(oldVecs, "vec_id", "embedding", nLists = 3,
        trainFraction = 1.0), path)
    IndexStore.appendIvf(newVecs, "vec_id", "embedding", path)
    val pinned = IndexStore.loadIvf(spark, path)
    val full = oldVecs.unionByName(newVecs)
    IndexStore.rebuildIvf(full, "vec_id", "embedding", path,
      trainFraction = 1.0)
    // rebuild ≡ fresh build: same corpus, same seed, same params
    val fresh = tmp()
    IndexStore.saveIvf(
      IvfIndex.build(full, "vec_id", "embedding", nLists = 3,
        trainFraction = 1.0), fresh)
    val ts = Seq("centroids", "assign")
    assert(canonIndex(path, ts) == canonIndex(fresh, ts),
      "rebuilt model must equal a from-scratch build")
    // the pre-rebuild reader still probes its pinned generation
    assert(IvfIndex.search(pinned, full, full.limit(2), "vec_id",
      "embedding", k = 3, nProbe = 3).count() > 0)
    // fresh load sees the rebuilt generation; searches agree with the
    // fresh-build model
    val a = canon(IvfIndex.search(IndexStore.loadIvf(spark, path), full,
      full.limit(4), "vec_id", "embedding", k = 3, nProbe = 2))
    val b = canon(IvfIndex.search(IndexStore.loadIvf(spark, fresh), full,
      full.limit(4), "vec_id", "embedding", k = 3, nProbe = 2))
    assert(a == b && a.nonEmpty)
    // nLists override updates the informational meta label
    IndexStore.rebuildIvf(full, "vec_id", "embedding", path, nLists = 5,
      trainFraction = 1.0)
    assert(IndexStore.readMeta(spark, path)("n_lists") == "5")
    assert(IndexStore.loadIvf(spark, path).centroids.length == 5)
  }

  test("text index: overlapping append raises; kind mismatch raises") {
    val path = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", path)
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendTextIndex(oldDocs.limit(1), "doc_id", "text", path)
    }
    assert(e.getMessage.contains("monotone"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IndexStore.loadCorpusIndex(spark, path)
    }
    assert(e2.getMessage.contains("expected"), e2.getMessage)
  }

  test("media index: append equals rebuild; indexed hamming join " +
      "matches the self-join operator's cross pairs") {
    // 8 signature families, 1-bit-apart siblings, ids interleaved so
    // corpus slices mix families; batch ids sit BELOW the corpus
    val base = 0x0F0F_1234_ABCD_5678L
    def hashOf(i: Long): Long = base ^ (1L << (i % 8)) ^
      (if (i % 2 == 0) 0L else 1L << 32)
    val all = (0L until 64L).map(i => (i, hashOf(i))).toDF("id", "dh")
    val corpusA = all.where(col("id") >= 16 && col("id") < 40)
    val corpusB = all.where(col("id") >= 40)
    val batch = all.where(col("id") < 16)
    val pApp = tmp(); val pFull = tmp()
    IndexStore.saveMediaIndex(corpusA, "id", "dh", pApp)
    IndexStore.appendMediaIndex(corpusB, "id", "dh", pApp)
    IndexStore.saveMediaIndex(corpusA.unionByName(corpusB), "id", "dh",
      pFull)
    // append ≡ rebuild, table for table (bands once per distinct dh)
    def tbl(p: String, t: String) = spark.read.parquet(s"$p/$t")
      .collect().map(_.toSeq).toSet
    assert(tbl(pApp, "members") == tbl(pFull, "members"))
    assert(tbl(pApp, "bands") == tbl(pFull, "bands"))
    // probe for probe...
    val got = Dedup.hammingJoinIndexed(batch,
        IndexStore.loadMediaIndex(spark, pApp), "id", "dh")
      .as[(Long, Long, Int)].collect().toSet
    // ...matching a brute-force replay of the screen semantics
    val hs = (0L until 64L).map(i => i -> hashOf(i)).toMap
    val want = (for {
      b <- 0L until 16L; c <- 16L until 64L
      d = java.lang.Long.bitCount(hs(b) ^ hs(c)) if d <= 3
    } yield (b, c, d)).toSet
    assert(want.nonEmpty && got == want,
      s"missing=${want -- got} extra=${got -- want}")
    // monotone-id contract holds for the media kind too
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendMediaIndex(batch, "id", "dh", pApp)
    }
    assert(e.getMessage.contains("monotone"), e.getMessage)
    // loader cap drops crowded buckets wholesale: cap=1 kills every
    // multi-signature bucket, leaving only exact-signature matches
    // reachable through singleton band buckets
    val capped = Dedup.hammingJoinIndexed(batch,
        IndexStore.loadMediaIndex(spark, pApp, maxBucketSize = 1),
        "id", "dh")
      .as[(Long, Long, Int)].collect().toSet
    assert(capped.subsetOf(got) && capped.size < got.size)
  }

  test("ingestMedia: screen → reject → append-admitted; later rounds " +
      "match earlier admissions; all-duplicate rounds leave the index intact") {
    val sigA = 0x1234_5678_9ABC_DEF0L
    val sigN = 0x0F0F_F0F0_0F0F_F0F0L // no 16-bit band shared with A
    val path = tmp()
    IndexStore.saveMediaIndex(
      Seq((10L, sigA), (11L, sigA)).toDF("id", "dh"), "id", "dh", path)
    // round 1: one near-dup of the corpus pair, one novel signature
    val v1 = IndexStore.ingestMedia(
        Seq((20L, sigA ^ 1L), (21L, sigN)).toDF("id", "dh"), "id", "dh", path)
      .orderBy("asset_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toSeq
    assert(v1 == Seq((20L, "duplicate", 2L, 10L, 1), // both copies counted, best = (1, 10)
      (21L, "admitted", 0L, -1L, -1)), s"round 1: $v1")
    // round 2: matches the round-1 ADMISSION (index grew) and the
    // original corpus; the round-1 REJECT (id 20) is NOT in the index
    val v2 = IndexStore.ingestMedia(
        Seq((30L, sigN), (31L, sigA)).toDF("id", "dh"), "id", "dh", path)
      .orderBy("asset_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    assert(v2 == Seq((30L, "duplicate", 1L, 21L, 0),
      (31L, "duplicate", 2L, 10L, 0)), s"round 2: $v2")
    // round 3: every asset rejected — the empty append must leave the
    // index fully functional (round 4 screens identically)
    val v3 = IndexStore.ingestMedia(
        Seq((40L, sigN ^ 2L)).toDF("id", "dh"), "id", "dh", path)
      .collect()
    assert(v3.map(_.getString(1)).toSeq == Seq("duplicate"))
    val v4 = IndexStore.ingestMedia(
        Seq((50L, sigA)).toDF("id", "dh"), "id", "dh", path)
      .collect()
    assert(v4.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("duplicate", 2L)), "post-empty-append screen unchanged")
    // lifecycle ≡ rebuild: the index now holds corpus + the single
    // admission, exactly what a clean save over that set produces
    val pFull = tmp()
    IndexStore.saveMediaIndex(
      Seq((10L, sigA), (11L, sigA), (21L, sigN)).toDF("id", "dh"),
      "id", "dh", pFull)
    def tbl2(p: String, t: String) = spark.read.parquet(s"$p/$t")
      .collect().map(_.toSeq).toSet
    assert(tbl2(path, "members") == tbl2(pFull, "members"))
    assert(tbl2(path, "bands") == tbl2(pFull, "bands"))
  }

  test("ingestVector: screen → reject → append-admitted; later rounds " +
      "match earlier admissions; lifecycle ≡ rebuild") {
    // scaled copies share the exact sign pattern (every plane dot
    // scales by the same positive factor), so candidacy is guaranteed
    // deterministically and cos is exactly 1.0 — no recall caveat in
    // the assertions
    val u = Array(1.0, 0.0, 0.0, 0.0)
    val w = Array(0.0, 1.0, 0.0, 0.0)
    def scale(v: Array[Double], c: Double) = v.map(_ * c)
    val path = tmp()
    IndexStore.saveVectorIndex(
      Seq((10L, u), (11L, u)).toDF("id", "v"), "id", "v", path, dim = 4)
    val v1 = IndexStore.ingestVector(
        Seq((20L, scale(u, 2.0)), (21L, w)).toDF("id", "v"),
        "id", "v", path, threshold = 0.9)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    assert(v1 == Seq((20L, "duplicate", 2L, 10L, 1.0),
      (21L, "admitted", 0L, -1L, -1.0)), s"round 1: $v1")
    // round 2: the round-1 admission gates its scaled copy; the
    // round-1 REJECT (id 20) is not in the index
    val v2 = IndexStore.ingestVector(
        Seq((30L, scale(w, 3.0)), (31L, u)).toDF("id", "v"),
        "id", "v", path, threshold = 0.9)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(v2 == Seq((30L, "duplicate", 1L, 21L, 1.0),
      (31L, "duplicate", 2L, 10L, 1.0)), s"round 2: $v2")
    // lifecycle ≡ rebuild over corpus + the single admission
    val pFull = tmp()
    IndexStore.saveVectorIndex(
      Seq((10L, u), (11L, u), (21L, w)).toDF("id", "v"),
      "id", "v", pFull, dim = 4)
    def tbl3(p: String, t: String) = spark.read.parquet(s"$p/$t")
      .collect().map(_.toSeq.map {
        case a: Seq[_] => a.toList
        case x => x
      }).toSet
    assert(tbl3(path, "members") == tbl3(pFull, "members"))
    assert(tbl3(path, "reps") == tbl3(pFull, "reps"))
    assert(tbl3(path, "blocks") == tbl3(pFull, "blocks"))
  }

  test("ingestCorpus: screen → reject → append-admitted; later rounds " +
      "match earlier admissions; lifecycle ≡ rebuild") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again now"
    val other = "spark structured streaming state stores and watermarks explained carefully"
    val otherNear = "spark structured streaming state stores and watermarks explained properly"
    val path = tmp()
    IndexStore.saveCorpusIndex(
      Seq((10L, base), (11L, base)).toDF("id", "text"), "id", "text", path)
    val v1 = IndexStore.ingestCorpus(
        Seq((20L, near), (21L, other)).toDF("id", "text"),
        "id", "text", path, threshold = 0.5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    assert(v1.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq((20L, "duplicate", 2L, 10L), (21L, "admitted", 0L, -1L)),
      s"round 1: $v1")
    assert(v1.head._5 >= 0.5 && v1.head._5 < 1.0,
      s"near-dup best_jaccard in [0.5, 1): ${v1.head._5}")
    // round 2: the round-1 admission gates its near-dup; the exact
    // corpus copy surfaces both members at jaccard 1.0
    val v2 = IndexStore.ingestCorpus(
        Seq((30L, otherNear), (31L, base)).toDF("id", "text"),
        "id", "text", path, threshold = 0.5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(v2.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq((30L, "duplicate", 1L, 21L), (31L, "duplicate", 2L, 10L)),
      s"round 2: $v2")
    assert(v2(1)._5 == 1.0, "exact copy scores jaccard 1.0")
    // lifecycle ≡ rebuild over corpus + the single admission
    val pFull = tmp()
    IndexStore.saveCorpusIndex(
      Seq((10L, base), (11L, base), (21L, other)).toDF("id", "text"),
      "id", "text", pFull)
    def tbl4(p: String, t: String) = spark.read.parquet(s"$p/$t")
      .collect().map(_.toSeq.map {
        case a: Seq[_] => a.toList
        case x => x
      }).toSet
    assert(tbl4(path, "members") == tbl4(pFull, "members"))
    assert(tbl4(path, "sets") == tbl4(pFull, "sets"))
    assert(tbl4(path, "bands") == tbl4(pFull, "bands"))
  }

  test("corpus index: torn append (members without sets) raises at load — " +
      "the unhealable shape is detected, not silently under-probed") {
    val path = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", path)
    // simulate: appendCorpusIndex wrote members, crashed before sets —
    // the group's text is gone, so these members can never be probed
    // or healed
    Seq((50L, 50L), (50L, 51L)).toDF("corpus_id", "member_id")
      .write.mode("append").parquet(s"$path/members")
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadCorpusIndex(spark, path)
    }
    assert(e.getMessage.contains("torn") && e.getMessage.contains("sets"),
      e.getMessage)
    // the ingest round loads through the same check → also refuses
    val e2 = intercept[IllegalArgumentException] {
      IndexStore.ingestCorpus(Seq((200L, sentence(30))).toDF("doc_id", "text"),
        "doc_id", "text", path)
    }
    assert(e2.getMessage.contains("torn"), e2.getMessage)
    // forensic bypass for manual repair tooling
    IndexStore.loadCorpusIndex(spark, path, check = false): Unit
  }

  test("corpus index: torn append (sets without bands) heals on the next " +
      "append — band rows recompute from the stored text") {
    val tornText = sentence(30)
    val lateText = sentence(30)
    val path = tmp(); val pAux = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", path)
    // simulate: members+sets landed for doc 50, crash before bands —
    // the aux build provides byte-identical sets/members rows
    IndexStore.saveCorpusIndex(
      oldDocs.unionByName(Seq((50L, tornText)).toDF("doc_id", "text")),
      "doc_id", "text", pAux)
    spark.read.parquet(s"$pAux/members").where($"corpus_id" === 50L)
      .write.mode("append").parquet(s"$path/members")
    spark.read.parquet(s"$pAux/sets").where($"corpus_id" === 50L)
      .write.mode("append").parquet(s"$path/sets")
    // torn state: loads fine (member coverage holds) but the torn doc
    // is invisible to probes — under-recall, not wrongness
    def probeTorn() = Dedup.minhashLSHJoinIndexed(
        Seq((900L, tornText)).toDF("doc_id", "text"),
        IndexStore.loadCorpusIndex(spark, path), "doc_id", "text")
      .where($"corpus_id" === 50L).count()
    assert(probeTorn() == 0L, "torn doc must be unreachable pre-heal")
    // the next append heals: doc 50's bands recompute from sets.text
    IndexStore.appendCorpusIndex(Seq((60L, lateText)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    assert(probeTorn() > 0L, "post-heal the torn doc is reachable at jaccard 1")
    // healed state ≡ clean rebuild, table for table
    val pFull = tmp()
    IndexStore.saveCorpusIndex(
      oldDocs.unionByName(Seq((50L, tornText), (60L, lateText))
        .toDF("doc_id", "text")),
      "doc_id", "text", pFull)
    val ts = Seq("bands", "sets", "members")
    assert(canonIndex(path, ts) == canonIndex(pFull, ts))
  }

  test("vector index: torn append (members without reps) raises at load; " +
      "(reps without blocks) heals on the next append") {
    // unhealable shape: member rows whose rep vector was never written
    val p1 = tmp()
    IndexStore.saveVectorIndex(oldVecs, "vec_id", "embedding", p1, dim = 8)
    Seq((50L, 50L)).toDF("rep_id", "member_id")
      .write.mode("append").parquet(s"$p1/members")
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadVectorIndex(spark, p1)
    }
    assert(e.getMessage.contains("torn") && e.getMessage.contains("reps"),
      e.getMessage)
    IndexStore.loadVectorIndex(spark, p1, check = false): Unit

    // healable shape: reps+members landed, crash before blocks
    val tornVec = vec(1, 7)
    val lateVec = vec(2, 8)
    val p2 = tmp(); val pAux = tmp()
    IndexStore.saveVectorIndex(oldVecs, "vec_id", "embedding", p2, dim = 8)
    IndexStore.saveVectorIndex(
      oldVecs.unionByName(Seq((50L, tornVec)).toDF("vec_id", "embedding")),
      "vec_id", "embedding", pAux, dim = 8)
    spark.read.parquet(s"$pAux/members").where($"rep_id" === 50L)
      .write.mode("append").parquet(s"$p2/members")
    spark.read.parquet(s"$pAux/reps").where($"rep_id" === 50L)
      .write.mode("append").parquet(s"$p2/reps")
    def probeTorn() = Similarity.lshTopKIndexed(
        IndexStore.loadVectorIndex(spark, p2),
        Seq((900L, tornVec)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = 8, k = 3)
      .where($"neighbor_id" === 50L).count()
    assert(probeTorn() == 0L, "torn vector unreachable pre-heal")
    IndexStore.appendVectorIndex(
      Seq((60L, lateVec)).toDF("vec_id", "embedding"), "vec_id", "embedding", p2)
    assert(probeTorn() > 0L, "post-heal the torn vector is reachable")
    val pFull = tmp()
    IndexStore.saveVectorIndex(
      oldVecs.unionByName(Seq((50L, tornVec), (60L, lateVec))
        .toDF("vec_id", "embedding")),
      "vec_id", "embedding", pFull, dim = 8)
    val ts = Seq("blocks", "reps", "members")
    assert(canonIndex(p2, ts) == canonIndex(pFull, ts))
  }

  test("ingest rounds are replay-idempotent: a re-run against an index " +
      "containing the batch's own admissions reproduces the original " +
      "verdicts and leaves the index unchanged") {
    // media: the crash window is between the index append (inside the
    // round) and the caller's verdict write — the replay re-screens
    // against an index that already holds admission 21
    val sigA = 0x1234_5678_9ABC_DEF0L
    val sigN = 0x0F0F_F0F0_0F0F_F0F0L
    val mPath = tmp()
    IndexStore.saveMediaIndex(
      Seq((10L, sigA), (11L, sigA)).toDF("id", "dh"), "id", "dh", mPath)
    val mBatch = Seq((20L, sigA ^ 1L), (21L, sigN)).toDF("id", "dh")
    def mRun() = IndexStore.ingestMedia(mBatch, "id", "dh", mPath)
      .orderBy("asset_id").collect().map(_.toString).toSeq
    val m1 = mRun(); val m2 = mRun()
    assert(m1 == m2, s"media replay drifted: $m1 vs $m2")
    assert(m1.exists(_.contains("admitted")), s"fixture must admit: $m1")
    val mFull = tmp()
    IndexStore.saveMediaIndex(
      Seq((10L, sigA), (11L, sigA), (21L, sigN)).toDF("id", "dh"),
      "id", "dh", mFull)
    assert(canonIndex(mPath, Seq("members", "bands")) ==
      canonIndex(mFull, Seq("members", "bands")),
      "replay must not grow the media index")

    // vector sibling
    val u = Array(1.0, 0.0, 0.0, 0.0); val w = Array(0.0, 1.0, 0.0, 0.0)
    val vPath = tmp()
    IndexStore.saveVectorIndex(
      Seq((10L, u), (11L, u)).toDF("id", "v"), "id", "v", vPath, dim = 4)
    val vBatch = Seq((20L, u.map(_ * 2)), (21L, w)).toDF("id", "v")
    def vRun() = IndexStore.ingestVector(vBatch, "id", "v", vPath,
      threshold = 0.9).orderBy("vec_id").collect().map(_.toString).toSeq
    val v1 = vRun(); val v2 = vRun()
    assert(v1 == v2, s"vector replay drifted: $v1 vs $v2")
    assert(v1.exists(_.contains("admitted")), s"fixture must admit: $v1")

    // corpus sibling
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "spark structured streaming state stores and watermarks explained carefully"
    val cPath = tmp()
    IndexStore.saveCorpusIndex(
      Seq((10L, base), (11L, base)).toDF("id", "text"), "id", "text", cPath)
    val cBatch = Seq((20L, other)).toDF("id", "text")
    def cRun() = IndexStore.ingestCorpus(cBatch, "id", "text", cPath,
      threshold = 0.5).orderBy("doc_id").collect().map(_.toString).toSeq
    val c1 = cRun(); val c2 = cRun()
    assert(c1 == c2, s"corpus replay drifted: $c1 vs $c2")
    assert(c1.exists(_.contains("admitted")), s"fixture must admit: $c1")
  }

  test("ingest rounds: admitted ids straddling the index max raise; " +
      "null/wrong-dim vectors are dropped before screening") {
    val sigA = 0x1234_5678_9ABC_DEF0L
    val path = tmp()
    IndexStore.saveMediaIndex(
      Seq((10L, sigA), (20L, sigA)).toDF("id", "dh"), "id", "dh", path)
    // novel signatures at ids 15 and 30: both admitted, 15 sits below
    // the index max (20) while 30 sits above — neither a clean replay
    // nor a fresh batch, so the contract violation raises
    val e = intercept[IllegalArgumentException] {
      IndexStore.ingestMedia(
        Seq((15L, 0x1L), (30L, 0x2L)).toDF("id", "dh"), "id", "dh", path)
    }
    assert(e.getMessage.contains("straddle"), e.getMessage)
    // replay-SHAPED but nothing is a member: a reused id range, not a
    // replay — raises instead of silently recording unindexed verdicts
    val e2 = intercept[IllegalArgumentException] {
      IndexStore.ingestMedia(
        Seq((12L, 0x4L)).toDF("id", "dh"), "id", "dh", path)
    }
    assert(e2.getMessage.contains("reused id range"), e2.getMessage)

    val u = Array(1.0, 0.0, 0.0, 0.0); val w = Array(0.0, 1.0, 0.0, 0.0)
    val vPath = tmp()
    IndexStore.saveVectorIndex(
      Seq((10L, u)).toDF("id", "v"), "id", "v", vPath, dim = 4)
    val dirty = Seq(
      (20L, null.asInstanceOf[Array[Double]]), // null embedding
      (21L, Array(1.0, 2.0)),                  // wrong dimension
      (22L, w))                                // valid, novel
      .toDF("id", "v")
    val verdicts = IndexStore.ingestVector(dirty, "id", "v", vPath,
      threshold = 0.9)
    assert(verdicts.select("vec_id").as[Long].collect().toSeq == Seq(22L),
      "null/wrong-dim rows get no verdict and never reach the index")
    val members = spark.read.parquet(s"$vPath/members")
      .select("member_id").as[Long].collect().toSet
    assert(members == Set(10L, 22L), s"index members: $members")

    // corpus sibling: a null-text doc gets NO verdict row (it can never
    // be indexed — the collapse drops null texts — so an "admitted"
    // verdict for it would be a phantom) and never reaches the index
    val cPath = tmp()
    IndexStore.saveCorpusIndex(
      Seq((10L, "the quick brown fox jumps over the lazy dog today"))
        .toDF("id", "text"), "id", "text", cPath)
    val cDirty = Seq(
      (20L, null.asInstanceOf[String]),
      (21L, "spark structured streaming state stores explained with care"))
      .toDF("id", "text")
    val cv = IndexStore.ingestCorpus(cDirty, "id", "text", cPath,
      threshold = 0.7)
    assert(cv.select("doc_id").as[Long].collect().toSeq == Seq(21L),
      "null-text rows get no verdict and never reach the index")
    val cMembers = spark.read.parquet(s"$cPath/members")
      .select("member_id").as[Long].collect().toSet
    assert(cMembers == Set(10L, 21L), s"corpus index members: $cMembers")
  }

  test("compactIndex: collapses append-accumulated small files; " +
      "compact ≡ append-chain, table for table and probe for probe") {
    // media kind: one save + three appends = four file generations
    val base = 0x0F0F_1234_ABCD_5678L
    def hashOf(i: Long): Long = base ^ (1L << (i % 8)) ^
      (if (i % 2 == 0) 0L else 1L << 32)
    val all = (0L until 64L).map(i => (i, hashOf(i))).toDF("id", "dh")
    val path = tmp()
    IndexStore.saveMediaIndex(all.where($"id" >= 16 && $"id" < 32),
      "id", "dh", path)
    for ((lo, hi) <- Seq((32L, 44L), (44L, 56L), (56L, 64L)))
      IndexStore.appendMediaIndex(all.where($"id" >= lo && $"id" < hi),
        "id", "dh", path)
    val batch = all.where($"id" < 16)
    def probe() = Dedup.hammingJoinIndexed(batch,
        IndexStore.loadMediaIndex(spark, path), "id", "dh")
      .collect().map(_.toString).sorted.toSeq
    val ts = Seq("bands", "members")
    val preTables = canonIndex(path, ts)
    val preProbe = probe()
    assert(preProbe.nonEmpty)
    val stats = IndexStore.compactIndex(spark, path)
    assert(stats.map(_.table).toSet == ts.toSet)
    assert(stats.forall(s => s.filesAfter < s.filesBefore),
      s"four write generations must collapse: $stats")
    assert(stats.forall(_.filesAfter == 1L),
      s"tiny tables compact to one file: $stats")
    assert(canonIndex(path, ts) == preTables,
      "compaction must move rows, never change them")
    assert(probe() == preProbe, "probe surface unchanged by compaction")
    // the lifecycle continues: append after compact lands in the
    // ACTIVE generation, monotone guard intact
    IndexStore.appendMediaIndex(Seq((99L, 0x7777_8888_9999_AAAAL))
      .toDF("id", "dh"), "id", "dh", path)
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "members"))
      .count() == preTables("members").size + 1)

    // corpus kind (multi-table, sets carry text) + crash recovery
    val cPath = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", cPath)
    IndexStore.appendCorpusIndex(newDocs, "doc_id", "text", cPath)
    val cts = Seq("bands", "sets", "members")
    val cPre = canonIndex(cPath, cts)
    // simulate a compact that crashed between its two renames: the
    // members dir is aside, the table dir is gone
    val fsDir = new java.io.File(s"$cPath/members")
    assert(fsDir.renameTo(new java.io.File(s"$cPath/members__old")))
    intercept[Exception] { IndexStore.loadCorpusIndex(spark, cPath) }
    val cStats = IndexStore.compactIndex(spark, cPath)
    assert(cStats.map(_.table).toSet == cts.toSet)
    assert(canonIndex(cPath, cts) == cPre,
      "recovery + compaction must restore the exact table image")
    assert(!new java.io.File(s"$cPath/members__old").exists &&
      !new java.io.File(s"$cPath/members__compacting").exists,
      "no debris after a clean compact")
    IndexStore.loadCorpusIndex(spark, cPath): Unit

    // remaining kinds: the table/key mappings must round-trip for
    // vector, ivf and text too (a wrong key column would throw in the
    // repartition; a wrong table name in the listing)
    val vPath = tmp()
    IndexStore.saveVectorIndex(oldVecs, "vec_id", "embedding", vPath, dim = 8)
    IndexStore.appendVectorIndex(newVecs, "vec_id", "embedding", vPath)
    val vts = Seq("blocks", "reps", "members")
    val vPre = canonIndex(vPath, vts)
    assert(IndexStore.compactIndex(spark, vPath).map(_.table).toSet == vts.toSet)
    assert(canonIndex(vPath, vts) == vPre)
    IndexStore.loadVectorIndex(spark, vPath): Unit

    val iPath = tmp()
    IndexStore.saveIvf(
      IvfIndex.build(oldVecs, "vec_id", "embedding", nLists = 3,
        trainFraction = 1.0), iPath)
    IndexStore.appendIvf(newVecs, "vec_id", "embedding", iPath)
    val iPre = canonIndex(iPath, Seq("assign", "centroids"))
    assert(IndexStore.compactIndex(spark, iPath).map(_.table).toSet ==
      Set("assign", "centroids"))
    assert(canonIndex(iPath, Seq("assign", "centroids")) == iPre)
    IndexStore.loadIvf(spark, iPath): Unit

    val tPath = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", tPath)
    IndexStore.appendTextIndex(newDocs, "doc_id", "text", tPath)
    val tPre = canonIndex(tPath, Seq("postings", "doclen"))
    assert(IndexStore.compactIndex(spark, tPath).map(_.table).toSet ==
      Set("postings", "doclen"))
    assert(canonIndex(tPath, Seq("postings", "doclen")) == tPre)
    IndexStore.loadTextIndex(spark, tPath): Unit
  }

  test("compaction is ONLINE for readers: an index loaded pre-swap keeps " +
      "probing correctly after compaction (its generation is retained), " +
      "fresh loads pin the new generation, reap retires the rest, and a " +
      "rebuild resets to generation 0") {
    val base = 0x0F0F_1234_ABCD_5678L
    def hashOf(i: Long): Long = base ^ (1L << (i % 8)) ^
      (if (i % 2 == 0) 0L else 1L << 32)
    val all = (0L until 64L).map(i => (i, hashOf(i))).toDF("id", "dh")
    val path = tmp()
    IndexStore.saveMediaIndex(all.where($"id" >= 16 && $"id" < 48),
      "id", "dh", path)
    IndexStore.appendMediaIndex(all.where($"id" >= 48), "id", "dh", path)
    val batch = all.where($"id" < 16)
    def probeOf(idx: Dedup.MediaIndex) =
      Dedup.hammingJoinIndexed(batch, idx, "id", "dh")
        .collect().map(_.toString).sorted.toSeq
    val expected = probeOf(IndexStore.loadMediaIndex(spark, path))
    assert(expected.nonEmpty)

    // a reader PINNED at generation 0 (file listing taken at load)...
    val pinned0 = IndexStore.loadMediaIndex(spark, path)
    val stats1 = IndexStore.compactIndex(spark, path)
    assert(stats1.forall(_.filesAfter == 1L), s"$stats1")
    // ...still probes correctly AFTER the swap: generation 0 is
    // retained as the immediately-prior generation
    assert(probeOf(pinned0) == expected,
      "pre-swap reader must survive an online compaction")
    assert(new java.io.File(s"$path/members").exists,
      "prior generation (0: the plain dir) must be retained for pinned readers")
    assert(IndexStore.tableDir(spark, path, "members")
      .endsWith("members__g00001"), "fresh resolution pins generation 1")
    assert(probeOf(IndexStore.loadMediaIndex(spark, path)) == expected)

    // second compaction while a generation-1 reader is pinned: swap to
    // generation 2, grace-reap generation 0, retain generation 1
    val pinned1 = IndexStore.loadMediaIndex(spark, path)
    IndexStore.compactIndex(spark, path): Unit
    assert(!new java.io.File(s"$path/members").exists,
      "generation 0 is older-than-prior after the second swap — reaped")
    assert(new java.io.File(s"$path/members__g00001").exists,
      "generation 1 retained for its pinned readers")
    assert(probeOf(pinned1) == expected,
      "generation-1 reader must survive the second compaction")
    assert(probeOf(IndexStore.loadMediaIndex(spark, path)) == expected)

    // explicit reap (the operator's no-readers-left cadence) retires
    // every non-active generation; the active one keeps probing
    val reaped = IndexStore.reapIndexGenerations(spark, path).sorted
    assert(reaped == Seq("bands__g00001", "members__g00001"), s"$reaped")
    assert(probeOf(IndexStore.loadMediaIndex(spark, path)) == expected)
    // and appends keep working against the active generation
    IndexStore.appendMediaIndex(Seq((99L, 0x7777_8888_9999_AAAAL))
      .toDF("id", "dh"), "id", "dh", path)
    assert(probeOf(IndexStore.loadMediaIndex(spark, path)) == expected)

    // a full rebuild (save*) resets the root to generation 0: plain
    // dirs active, no manifest, no generation debris (same corpus as
    // the original build minus the post-compact 99 append, so the
    // probe image is unchanged)
    IndexStore.saveMediaIndex(all.where($"id" >= 16), "id", "dh", path)
    assert(IndexStore.tableDir(spark, path, "members") == s"$path/members")
    assert(!new java.io.File(s"$path/$GenManifestName").exists,
      "rebuild must drop the generation manifest")
    assert(Option(new java.io.File(path).listFiles()).get
      .forall(f => !f.getName.matches(".*__g\\d+$")),
      "rebuild must clear stale generation dirs")
    assert(probeOf(IndexStore.loadMediaIndex(spark, path)) == expected)
  }

  private val GenManifestName = "_generations"

  test("describeIndex + checkIndex: storage report tracks generations and " +
      "stale dirs; the fsck reports every torn shape without raising") {
    // corpus: healthy → empty report; then inject BOTH torn shapes
    val cPath = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", cPath)
    assert(IndexStore.checkIndex(spark, cPath).isEmpty)
    // healable: a sets row (with shingles) whose bands never landed
    val scratch = tmp()
    IndexStore.saveCorpusIndex(Seq((60L, sentence(30))).toDF("doc_id", "text"),
      "doc_id", "text", scratch)
    spark.read.parquet(s"$scratch/sets")
      .write.mode("append").parquet(s"$cPath/sets")
    spark.read.parquet(s"$scratch/members")
      .write.mode("append").parquet(s"$cPath/members")
    // unhealable: a member row whose sets row never landed
    Seq((70L, 70L)).toDF("corpus_id", "member_id")
      .write.mode("append").parquet(s"$cPath/members")
    val cFindings = IndexStore.checkIndex(spark, cPath)
      .map(f => (f.table, f.severity)).toSet
    assert(cFindings == Set(("members", "unhealable"), ("sets", "healable")),
      s"$cFindings")

    // text: ALL THREE repairable shapes surface distinctly, then one
    // repairTextIndex prunes every inconsistent doc
    val tPath = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", tPath)
    // doclen-only (this library's crash shape)
    Seq((50L, 30L)).toDF("doc_id", "dl")
      .write.mode("append").parquet(s"$tPath/doclen")
    // postings-only (external/legacy half-index)
    Seq((60L, "zzz", 3L)).toDF("doc_id", "term", "tf")
      .write.mode("append").parquet(s"$tPath/postings")
    // partial: an existing doc's dl no longer equals its Σtf (the
    // shape BOTH directional anti-joins miss)
    Seq((0L, "xtraterm", 5L)).toDF("doc_id", "term", "tf")
      .write.mode("append").parquet(s"$tPath/postings")
    val tf = IndexStore.checkIndex(spark, tPath)
      .map(f => (f.table, f.check)).toSet
    assert(tf == Set(("doclen", "postings-coverage"),
      ("postings", "doclen-coverage"), ("postings", "tf-sum-identity")),
      s"$tf")
    assert(IndexStore.repairTextIndex(spark, tPath) == 3L,
      "three inconsistent docs pruned at doc grain")
    assert(IndexStore.checkIndex(spark, tPath).isEmpty)
    IndexStore.loadTextIndex(spark, tPath): Unit
    assert(spark.read.parquet(
        IndexStore.tableDir(spark, tPath, "doclen"))
      .where(col("doc_id").isin(0L, 50L)).count() == 0,
      "the partial doc and the doclen orphan are gone from doclen")
    assert(spark.read.parquet(
        IndexStore.tableDir(spark, tPath, "postings"))
      .where(col("doc_id").isin(0L, 60L)).count() == 0,
      "the partial doc and the postings orphan are gone from postings")

    // ivf: duplicate assignment id → unhealable finding
    val iPath = tmp()
    IndexStore.saveIvf(IvfIndex.build(oldVecs, "vec_id", "embedding",
      nLists = 3, trainFraction = 1.0), iPath)
    assert(IndexStore.checkIndex(spark, iPath).isEmpty)
    spark.read.parquet(s"$iPath/assign").limit(1)
      .write.mode("append").parquet(s"$iPath/assign")
    assert(IndexStore.checkIndex(spark, iPath)
      .map(f => (f.table, f.severity)) == Seq(("assign", "unhealable")))

    // media + describeIndex: file counts, generation bump, stale dirs
    val mPath = tmp()
    val sigs = (0L until 32L).map(i => (i, 0x1000_0000L * (i % 4) + i / 4))
      .toDF("id", "dh")
    IndexStore.saveMediaIndex(sigs.where($"id" < 16), "id", "dh", mPath)
    IndexStore.appendMediaIndex(sigs.where($"id" >= 16), "id", "dh", mPath)
    assert(IndexStore.checkIndex(spark, mPath).isEmpty)
    val pre = IndexStore.describeIndex(spark, mPath)
    assert(pre.map(_.table).toSet == Set("bands", "members"))
    assert(pre.forall(s => s.generation == 0L && s.staleGenerations == 0L &&
      s.files > 1L && s.bytes > 0L), s"$pre")
    IndexStore.compactIndex(spark, mPath): Unit
    val post = IndexStore.describeIndex(spark, mPath)
    assert(post.forall(s => s.generation == 1L && s.files == 1L &&
      s.staleGenerations == 1L), // the retired plain dir awaits reap
      s"$post")
    IndexStore.reapIndexGenerations(spark, mPath): Unit
    assert(IndexStore.describeIndex(spark, mPath)
      .forall(_.staleGenerations == 0L))
    // torn media (members without bands) surfaces as healable
    Seq((0x7777_0000_1111_2222L, 99L)).toDF("dh", "member_id")
      .write.mode("append")
      .parquet(IndexStore.tableDir(spark, mPath, "members"))
    assert(IndexStore.checkIndex(spark, mPath)
      .map(f => (f.table, f.severity)) == Seq(("members", "healable")))
  }

  test("intra-batch collapse composes into ingestVector: one admission " +
      "per near-dup family (the q251 pattern, semantic sibling)") {
    val u = Array(1.0, 0.0, 0.0, 0.0)
    val w = Array(0.0, 1.0, 0.0, 0.0)
    val path = tmp()
    IndexStore.saveVectorIndex(
      Seq((10L, u)).toDF("id", "v"), "id", "v", path, dim = 4)
    // 20/21: mutually-near novel family (scaled copies, cos exactly 1.0
    // with guaranteed shared sign pattern); 22: copy of the corpus vector
    val batch = Seq((20L, w), (21L, w.map(_ * 2)), (22L, u.map(_ * 3)))
      .toDF("id", "v")
    val pairs = Similarity.cosineNearDupPairs(batch, "id", "v",
      dim = 4, threshold = 0.9)
    val survivors = batch.join(
      pairs.select(col("id_b").as("id")).distinct(), Seq("id"), "left_anti")
    val v = IndexStore.ingestVector(survivors, "id", "v", path,
        threshold = 0.9)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v == Seq((20L, "admitted"), (22L, "duplicate")),
      s"family head admits, corpus copy rejects: $v")
    val members = spark.read.parquet(s"$path/members")
      .select("member_id").as[Long].collect().toSet
    assert(members == Set(10L, 20L),
      s"exactly one member of the 20/21 family reached the index: $members")
  }

  test("ingest rounds: a cap-flip replay whose flipped id sits ABOVE the " +
      "index max (straddle shape) is verified by the at-or-below members " +
      "and appends only the above-max remainder — no wedge") {
    // replay scenario: the original round admitted 20 and 21 (both
    // indexed, so index max = 21), then crashed before its verdict
    // write. The replay re-screens the SAME batch, but a load-time cap
    // flip now admits 25 too — formerly rejected, never indexed, id
    // above the index max. Admitted ids {20, 21, 25} straddle the max:
    // the pre-round-11 guard raised here on every retry (a permanent
    // wedge of the at-least-once loop); the contract is that the
    // at-or-below subset's membership verifies the replay and the
    // above-max remainder is appended.
    val sigA = 0x1234_5678_9ABC_DEF0L
    val sigB = 0x0F0F_F0F0_0F0F_F0F0L
    val sigC = 0xAAAA_5555_CCCC_3333L
    val sigX = 0x1111_8888_4444_2222L // novel: far from all of the above
    val path = tmp()
    // index state as the crashed round left it: pre-batch doc 10 plus
    // the original admissions 20 and 21
    IndexStore.saveMediaIndex(
      Seq((10L, sigA), (20L, sigB), (21L, sigC)).toDF("id", "dh"),
      "id", "dh", path)
    val replayBatch = Seq((20L, sigB), (21L, sigC), (25L, sigX)).toDF("id", "dh")
    val v = IndexStore.ingestMedia(replayBatch, "id", "dh", path)
      .orderBy("asset_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v == Seq((20L, "admitted"), (21L, "admitted"), (25L, "admitted")),
      s"replay reproduces the original verdicts plus the flip: $v")
    val members = spark.read.parquet(s"$path/members")
      .select("member_id").as[Long].collect().toSet
    assert(members == Set(10L, 20L, 21L, 25L),
      s"only the above-max remainder (25) was appended: $members")
    // a SECOND retry is now a pure replay (all ids at-or-below max 25,
    // all members) — verdicts stable, index untouched
    val v2 = IndexStore.ingestMedia(replayBatch, "id", "dh", path)
      .orderBy("asset_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v2 == v, s"second retry drifted: $v2 vs $v")
    assert(spark.read.parquet(s"$path/members").count() == 4,
      "second retry must not grow the index")
  }

  test("corpus index: a shingle-less set row does not demote appends to " +
      "the heal anti-join — the coverage identity excludes band-less sets") {
    // this library's own writers cannot produce a shingle-less set
    // (null text is dropped at collapse; shingling non-null text
    // always yields ≥1 shingle — asserted below), so inject one
    // directly, the external/legacy-writer shape the fast path must
    // tolerate forever, alongside a GENUINE torn set (text-bearing,
    // bands lost) the next append must still heal
    val path = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", path)
    val meta = IndexStore.readMeta(spark, path)
    val numBands = meta("num_bands").toLong
    val shType = spark.read.parquet(s"$path/sets").schema("sh").dataType
    // degenerate: empty shingle array — zero band rows by construction
    Seq((50L, "", Seq.empty[String])).toDF("corpus_id", "text", "sh")
      .select(col("corpus_id"), col("text"), col("sh").cast(shType))
      .write.mode("append").parquet(s"$path/sets")
    Seq((50L, 50L)).toDF("corpus_id", "member_id")
      .write.mode("append").parquet(s"$path/members")
    // genuine torn set: full shingles, band rows never landed (derive
    // the sets/members rows the same way the builder does — via a
    // scratch save — and copy everything except the bands)
    val tornText = sentence(30)
    val scratch = tmp()
    IndexStore.saveCorpusIndex(Seq((60L, tornText)).toDF("doc_id", "text"),
      "doc_id", "text", scratch)
    spark.read.parquet(s"$scratch/sets")
      .write.mode("append").parquet(s"$path/sets")
    spark.read.parquet(s"$scratch/members")
      .write.mode("append").parquet(s"$path/members")
    // the fix's premise, pinned: the shingle-aware identity holds for
    // a healthy band table even with the degenerate set present, while
    // the naive all-sets identity (the pre-round-11 formula) is
    // permanently broken by it — and a real orphan breaks both
    val bands = spark.read.parquet(s"$path/bands").count()
    val sets = spark.read.parquet(s"$path/sets")
    assert(sets.where(size(col("sh")) === 0).count() == 1,
      "fixture must contain the degenerate band-less set")
    assert(bands != numBands * sets.count(),
      "naive identity is defeated by the degenerate set")
    assert(bands != numBands * sets.where(size(col("sh")) > 0).count(),
      "the genuine orphan (60) must be visible to the shingle-aware identity")
    // the next append heals the GENUINE orphan only; afterwards the
    // shingle-aware identity holds (fast path restored for every
    // subsequent append) while the naive one stays broken
    IndexStore.appendCorpusIndex(
      Seq((70L, sentence(30))).toDF("doc_id", "text"), "doc_id", "text", path)
    val bands2 = spark.read.parquet(s"$path/bands").count()
    val sets2 = spark.read.parquet(s"$path/sets")
    assert(bands2 == numBands * sets2.where(size(col("sh")) > 0).count(),
      "post-heal: shingle-aware identity restored — fast path holds")
    assert(bands2 != numBands * sets2.count(),
      "naive identity would still demote every future append")
    // healed orphan is probe-reachable; degenerate set never is
    val hits = Dedup.minhashLSHJoinIndexed(
        Seq((900L, tornText)).toDF("doc_id", "text"),
        IndexStore.loadCorpusIndex(spark, path), "doc_id", "text")
      .select("corpus_id").as[Long].collect().toSet
    assert(hits.contains(60L), s"healed orphan must match its copy: $hits")
  }

  test("media index: a torn append (members without bands) heals on the next append") {
    // crash scenario: appendMediaIndex writes members, dies before the
    // bands append. The orphaned signature is invisible to probes (its
    // member rows have no band rows) and the monotone-id guard rejects
    // a same-batch retry — the contract is that the NEXT append
    // backfills band rows for ANY member signature missing from bands,
    // restoring append ≡ rebuild without manual repair
    val corpus = Seq((10L, 0x1111_2222_3333_4444L), (11L, 0x1111_2222_3333_4445L))
      .toDF("id", "dh")
    val orphanSig = 0x5555_6666_7777_8888L
    val orphans = Seq((20L, orphanSig), (21L, orphanSig))
    val late = Seq((30L, 0x0101_0202_0303_0404L))
    val path = tmp()
    IndexStore.saveMediaIndex(corpus, "id", "dh", path)
    // simulate the torn append: member rows land, band rows never do
    orphans.toDF("id", "dh")
      .select(col("dh"), col("id").as("member_id"))
      .write.mode("append").parquet(s"$path/members")
    def probeOrphan() = Dedup.hammingJoinIndexed(
        Seq((1L, orphanSig)).toDF("id", "dh"),
        IndexStore.loadMediaIndex(spark, path), "id", "dh")
      .as[(Long, Long, Int)].collect().toSet
    assert(probeOrphan().isEmpty, "torn state: orphan unreachable (under-probe, not wrong)")
    // a retry of the torn batch is still rejected (ids already present)
    intercept[IllegalArgumentException] {
      IndexStore.appendMediaIndex(orphans.toDF("id", "dh"), "id", "dh", path)
    }
    // the next (fresh-id) append heals: orphan signature gets its bands
    IndexStore.appendMediaIndex(late.toDF("id", "dh"), "id", "dh", path)
    assert(probeOrphan() == Set((1L, 20L, 0), (1L, 21L, 0)),
      "post-heal: both orphan copies reachable at hamming 0")
    // healed state ≡ a clean rebuild over the same corpus, table for table
    val pFull = tmp()
    IndexStore.saveMediaIndex(
      corpus.unionByName(orphans.toDF("id", "dh")).unionByName(late.toDF("id", "dh")),
      "id", "dh", pFull)
    def tbl(p: String, t: String) = spark.read.parquet(s"$p/$t")
      .collect().map(_.toSeq).toSet
    assert(tbl(path, "members") == tbl(pFull, "members"))
    assert(tbl(path, "bands") == tbl(pFull, "bands"))
  }

  test("ingestText: BM25 ingest rounds screen, admit, grow the index, and " +
      "replay to the ORIGINAL scores (relation-level pre-batch restriction)") {
    // distinct-vocabulary docs: an exact copy matches only its original
    // (all its terms are df=1 there), a disjoint-vocab doc matches
    // nothing — the BM25 screen is exact, no banded luck anywhere
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val tB = "one two three four five six seven eight nine ten eleven twelve"
    val tC = "spark shuffle partition broadcast codegen watermark state store lineage stage task executor"
    val path = tmp()
    IndexStore.saveTextIndex(Seq((10L, tA), (11L, tB)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    // null and token-less texts get NO verdict row (phantom-admission
    // posture: textIndex writes no rows for them)
    val batch1 = Seq[(java.lang.Long, String)]((20L, tA), (21L, tC),
      (22L, null), (23L, "   ")).toDF("doc_id", "text")
    def vrows(df: DataFrame) = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    val v1 = vrows(IndexStore.ingestText(batch1, "doc_id", "text", path,
      minScoreE6 = 1000000L))
    assert(v1.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq((20L, "duplicate", 1L, 10L), (21L, "admitted", 0L, -1L)),
      s"round 1: $v1")
    assert(v1.head._5 >= 1000000L, s"copy score must clear the threshold: $v1")
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "doclen"))
      .select("doc_id").as[Long].collect().toSet == Set(10L, 11L, 21L),
      "only the admission grew the index")
    // replay of the completed round (the at-least-once retry): verdicts
    // — SCORES included, the stat-dependent part — are bit-identical,
    // and the index does not grow (the pre-round-11 appendTextIndex
    // overlap raise is exactly what this path must not hit)
    val v1b = vrows(IndexStore.ingestText(batch1, "doc_id", "text", path,
      minScoreE6 = 1000000L))
    assert(v1b == v1, s"replay drifted: $v1b vs $v1")
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "doclen"))
      .count() == 3, "replay must not grow the index")
    // round 2: a copy of round 1's admission rejects against it —
    // cross-batch growth through the persisted index
    val v2 = vrows(IndexStore.ingestText(Seq((30L, tC)).toDF("doc_id", "text"),
      "doc_id", "text", path, minScoreE6 = 1000000L))
    assert(v2.map(t => (t._1, t._2, t._4)) == Seq((30L, "duplicate", 21L)),
      s"round 2: $v2")
  }

  test("ingestText: a torn text append (doclen without postings) fails the " +
      "NEXT round loudly at load; repairTextIndex unblocks the retry") {
    val path = tmp()
    IndexStore.saveTextIndex(
      Seq((10L, "alpha beta gamma"), (11L, "one two three"))
        .toDF("doc_id", "text"),
      "doc_id", "text", path)
    // crash between appendTextIndex's doclen and postings writes
    Seq((50L, 7L)).toDF("doc_id", "dl")
      .write.mode("append").parquet(s"$path/doclen")
    val e = intercept[IllegalArgumentException] {
      IndexStore.ingestText(Seq((60L, "novel vocabulary entirely"))
        .toDF("doc_id", "text"), "doc_id", "text", path, 1000000L)
    }
    assert(e.getMessage.contains("torn"), e.getMessage)
    assert(IndexStore.repairTextIndex(spark, path) == 1L)
    val v = IndexStore.ingestText(Seq((60L, "novel vocabulary entirely"))
        .toDF("doc_id", "text"), "doc_id", "text", path, 1000000L)
      .select("status").as[String].collect().toSeq
    assert(v == Seq("admitted"), s"post-repair retry must run clean: $v")
  }

  test("ingestText guardrail: a dup-dense batch raises at the EXACT " +
      "estimated screen volume naming the dense terms; collapseFirst " +
      "admits one family head under the same budget") {
    val path = tmp()
    val dense = "apple banana cherry date elder fig grape honey iris juniper"
    val corpus = (0L until 8L).map(i => (i, s"$dense tag$i"))
      .toDF("doc_id", "text")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    // 16 exact copies of one dense text — the decontamination-batch
    // pathology: every dense term multiplies df=8 × queries=16
    val batch = (100L until 116L).map(i => (i, s"$dense tag0"))
      .toDF("doc_id", "text")
    // the dry-run estimate is exact: 10 dense terms at 8×16 = 128
    // plus tag0 at 1×16 = 16 → Σ 1296
    val est = IndexStore.estimateTextScreen(batch, "doc_id", "text", path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(est.map(_._4).sum == 1296L, s"estimate total: $est")
    assert(est.filter(_._1 == "tag0") == Seq(("tag0", 1L, 16L, 16L)) &&
      est.filter(_._1 == "apple") == Seq(("apple", 8L, 16L, 128L)),
      s"per-term estimate: $est")
    val e = intercept[IllegalStateException] {
      IndexStore.ingestText(batch, "doc_id", "text", path,
        minScoreE6 = 100000L, maxScreenPairs = 100L)
    }
    assert(e.getMessage.contains("1296") &&
      e.getMessage.contains("maxScreenPairs") &&
      e.getMessage.contains("128") &&
      e.getMessage.contains("collapseFirst"), e.getMessage)
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "doclen"))
      .count() == 8, "a refused round must not touch the index")
    // collapseFirst: 15 copies collapse intra-batch onto head 100, and
    // the head's own screen volume (10×8 + 1×1 = 81) fits the budget
    // the raw batch violated
    val v = IndexStore.ingestText(batch, "doc_id", "text", path,
        minScoreE6 = 100000L, maxScreenPairs = 100L, collapseFirst = true)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(v.head == ((100L, "duplicate", 8L, 0L)),
      s"the head screens against the corpus: ${v.head}")
    assert(v.tail == (101L until 116L).map(i =>
      (i, "collapsed", i - 100L, 100L)),
      s"copies collapse onto the smallest-id head: ${v.tail}")
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "doclen"))
      .count() == 8, "nothing admitted: the head was a corpus duplicate")
    // maxDfPpm: pruning the dense terms (df = 8 of N = 8 = 1e6 ppm,
    // over a 50% cut) makes the SAME batch fit the budget WITHOUT
    // collapsing — only the df=1 'tag0' term survives to score, and
    // its idf alone (ln 6 ≈ 1.79M e6) rejects every copy against
    // corpus doc 0; the estimate applies the same prune (16 pairs)
    assert(IndexStore.estimateTextScreen(batch, "doc_id", "text", path,
        maxDfPpm = Some(500000L))
      .agg(coalesce(sum(col("pairs")), lit(0L))).head().getLong(0) == 16L,
      "the estimate must not charge for pruned terms")
    val vp = IndexStore.ingestText(batch, "doc_id", "text", path,
        minScoreE6 = 100000L, maxScreenPairs = 100L,
        maxDfPpm = Some(500000L))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(vp == (100L until 116L).map(i => (i, "duplicate", 1L, 0L)),
      s"pruned screen: every copy matches doc 0 through tag0 alone: $vp")
  }

  test("compactIndex retainGenerations=2: a reader pinned TWO swaps back " +
      "still probes green; the third swap finally reaps its generation") {
    val base = 0x0F0F_1234_ABCD_5678L
    def hashOf(i: Long): Long = base ^ (1L << (i % 8)) ^
      (if (i % 2 == 0) 0L else 1L << 32)
    val all = (0L until 48L).map(i => (i, hashOf(i))).toDF("id", "dh")
    val path = tmp()
    IndexStore.saveMediaIndex(all.where($"id" >= 16), "id", "dh", path)
    val batch = all.where($"id" < 16)
    def probeOf(idx: Dedup.MediaIndex) =
      Dedup.hammingJoinIndexed(batch, idx, "id", "dh")
        .collect().map(_.toString).sorted.toSeq
    val expected = probeOf(IndexStore.loadMediaIndex(spark, path))
    assert(expected.nonEmpty)
    // pin at generation 0, then compact TWICE with retainGenerations=2:
    // the default-1 policy would delete generation 0 on the second swap
    // (the IndexStoreSpec online-compaction case pins exactly that);
    // retain 2 must keep it
    val pinned0 = IndexStore.loadMediaIndex(spark, path)
    IndexStore.compactIndex(spark, path, retainGenerations = 2): Unit
    IndexStore.compactIndex(spark, path, retainGenerations = 2): Unit
    assert(new java.io.File(s"$path/members").exists,
      "generation 0 must survive two swaps at retainGenerations=2")
    assert(probeOf(pinned0) == expected,
      "a reader pinned two compactions back must still probe green")
    // third swap: generation 0 is now beyond the retention window
    IndexStore.compactIndex(spark, path, retainGenerations = 2): Unit
    assert(!new java.io.File(s"$path/members").exists,
      "the third swap reaps the generation beyond the window")
    assert(new java.io.File(s"$path/members__g00001").exists &&
      new java.io.File(s"$path/members__g00002").exists,
      "the two most recent retired generations stay")
    assert(probeOf(IndexStore.loadMediaIndex(spark, path)) == expected)
    intercept[IllegalArgumentException] {
      IndexStore.compactIndex(spark, path, retainGenerations = 0)
    }
  }

  test("append-commit fence: a compaction racing an append raises loudly " +
      "instead of silently dropping the appended rows; the re-run lands") {
    val path = tmp()
    val sigs = (0L until 16L).map(i => (i, 0x1111_0000L * (i % 4) + i))
      .toDF("id", "dh")
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    val late = Seq((99L, 0x7777_8888_9999_AAAAL)).toDF("id", "dh")
    // interleave an external compaction into the append's
    // resolve-to-commit window (the documented exclusivity violation;
    // the UNLOCKED variant models a rogue/expired-TTL writer — the
    // lease prevents a well-behaved one from getting here at all)
    val e = IndexStore.withFenceHook(
        () => { IndexStore.compactIndexUnlocked(spark, path): Unit }) {
      intercept[IllegalStateException] {
        IndexStore.appendMediaIndex(late, "id", "dh", path)
      }
    }
    assert(e.getMessage.contains("compacted") &&
      e.getMessage.contains("generation 0 -> 1"), e.getMessage)
    // the raced rows landed only in the RETIRED generation — the active
    // one is clean, so the documented recovery (re-run the append)
    // works and the index ends consistent
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "members"))
      .where($"member_id" === 99L).count() == 0,
      "the active generation must not contain the raced append")
    IndexStore.appendMediaIndex(late, "id", "dh", path)
    val hits = Dedup.hammingJoinIndexed(
        Seq((1L, 0x7777_8888_9999_AAAAL)).toDF("id", "dh"),
        IndexStore.loadMediaIndex(spark, path), "id", "dh")
      .select("corpus_id").as[Long].collect().toSet
    assert(hits == Set(99L), s"re-run append must be probe-reachable: $hits")
  }

  test("compactIndex retainAge: retired generations survive by retire-" +
      "stamp AGE, not swap count — a fresh one outlives extra swaps, a " +
      "backdated one is reaped while recent ones stay") {
    val path = tmp()
    val sigs = (0L until 16L).map(i => (i, 0x00FF_0000L * (i % 4) + i))
      .toDF("id", "dh")
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    val hour = java.time.Duration.ofHours(1)
    intercept[IllegalArgumentException] {
      IndexStore.compactIndex(spark, path,
        retainAge = Some(java.time.Duration.ZERO))
    }
    IndexStore.compactIndex(spark, path, retainAge = Some(hour)): Unit
    IndexStore.compactIndex(spark, path, retainAge = Some(hour)): Unit
    // the count rule (default retain=1) would have reaped generation 0
    // at the second swap; under a 1h age window it survives — both
    // retired generations are minutes old
    assert(new java.io.File(s"$path/members").exists &&
      new java.io.File(s"$path/members__g00001").exists,
      "retired generations within the age window must survive any " +
        "number of swaps")
    // a generation retired LONGER ago than the window goes: backdate
    // generation 0's retire stamp two hours and swap again
    Seq("members", "bands").foreach { t =>
      assert(new java.io.File(s"$path/$t")
        .setLastModified(System.currentTimeMillis() - 2L * 3600L * 1000L))
    }
    IndexStore.compactIndex(spark, path, retainAge = Some(hour)): Unit
    assert(!new java.io.File(s"$path/members").exists &&
      !new java.io.File(s"$path/bands").exists,
      "a retired generation older than the window is reaped")
    assert(new java.io.File(s"$path/members__g00001").exists &&
      new java.io.File(s"$path/members__g00002").exists,
      "recently-retired generations stay")
    // the active generation is untouched and healthy
    assert(IndexStore.describeIndex(spark, path)
      .forall(_.generation == 3L))
    assert(IndexStore.loadMediaIndex(spark, path).members.count() == 16L)
    // the manual reap's age filter: recent retirees survive it, the
    // unfiltered form reclaims them
    assert(IndexStore.reapIndexGenerations(spark, path, Some(hour)).isEmpty,
      "retirees younger than the window must survive a filtered reap")
    assert(IndexStore.reapIndexGenerations(spark, path).nonEmpty)
    assert(IndexStore.loadMediaIndex(spark, path).members.count() == 16L)
  }

  test("single-writer lease: a second writer raises AT ACQUIRE while the " +
      "lease is live; release frees it; a crashed holder's lease expires " +
      "and a fresh append steals it") {
    val path = tmp()
    val sigs = (0L until 8L).map(i => (i, 0x5151L + i)).toDF("id", "dh")
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    assert(IndexStore.readIndexLease(spark, path).isEmpty,
      "every op releases its lease on completion")
    // an external coordinator (e.g. a migration) holds the lease: any
    // mutating op is refused BEFORE it reads a row — prevention, where
    // the fence was detection after the work was spent
    val held = IndexStore.acquireIndexLease(spark, path, "external-etl")
    val e1 = intercept[IllegalStateException] {
      IndexStore.appendMediaIndex(Seq((90L, 0x1L)).toDF("id", "dh"),
        "id", "dh", path)
    }
    assert(e1.getMessage.contains("lease") &&
      e1.getMessage.contains("external-etl"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      IndexStore.compactIndex(spark, path)
    }
    assert(e2.getMessage.contains("external-etl"), e2.getMessage)
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "members"))
      .count() == 8, "a refused append must not have written anything")
    IndexStore.releaseIndexLease(spark, path, held)
    IndexStore.appendMediaIndex(Seq((90L, 0x1L)).toDF("id", "dh"),
      "id", "dh", path)
    assert(IndexStore.readIndexLease(spark, path).isEmpty)
    // crashed holder: a lease whose TTL elapsed is stolen by the next
    // writer (epoch bumps), and releasing the STOLEN lease raises
    // loudly instead of deleting a lease another writer now holds
    val crashed = IndexStore.acquireIndexLease(spark, path, "crasher",
      ttlMs = 1L)
    Thread.sleep(10L)
    val thief = IndexStore.acquireIndexLease(spark, path, "thief2",
      ttlMs = 60000L)
    assert(thief.epoch == crashed.epoch + 1,
      s"epoch must increment across a steal: $crashed -> $thief")
    val e3 = intercept[IllegalStateException] {
      IndexStore.releaseIndexLease(spark, path, crashed)
    }
    assert(e3.getMessage.contains("ANOTHER writer") &&
      e3.getMessage.contains("thief2"), e3.getMessage)
    IndexStore.releaseIndexLease(spark, path, thief)
    // release is idempotent once the file is gone
    IndexStore.releaseIndexLease(spark, path, thief)
    // the rename-based protocol leaves NO lease debris on clean flows
    val debris = Option(new java.io.File(path).listFiles()).get
      .map(_.getName).filter(_.startsWith("_lease")).toSeq
    assert(debris.isEmpty, s"protocol must clean up after itself: $debris")
    // and a mutating op steals an expired lease the same way: a crash
    // never wedges the index
    IndexStore.acquireIndexLease(spark, path, "crasher2", ttlMs = 1L): Unit
    Thread.sleep(10L)
    IndexStore.appendMediaIndex(Seq((91L, 0x2L)).toDF("id", "dh"),
      "id", "dh", path)
    assert(IndexStore.readIndexLease(spark, path).isEmpty,
      "the stealing append releases ITS lease when done")
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "members"))
      .count() == 10)
  }

  test("lease capability probe: the local fs HAS rename-no-overwrite " +
      "(no warning, no probe debris); a degraded store warns LOUDLY " +
      "once per store and the op still proceeds (advisory)") {
    val path = tmp()
    val sigs = (0L until 4L).map(i => (i, 0x1L + i)).toDF("id", "dh")
    // the primitive itself, on the real test fs
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"file://$path"),
      spark.sparkContext.hadoopConfiguration)
    assert(IndexStore.probeRenameNoOverwrite(fs, path),
      "local filesystems must fail rename-onto-existing")
    val probeDebris = Option(new java.io.File(path).listFiles()).toSeq
      .flatten.map(_.getName).filter(_.contains("__probe_"))
    assert(probeDebris.isEmpty, s"probe must clean up: $probeDebris")
    // degraded-store branch: inject the probe result, capture the sink
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val prevSink = IndexStore.leaseWarnSink
    IndexStore.leaseWarnSink = warnings += _
    try IndexStore.withLeaseProbe(false) {
      IndexStore.saveMediaIndex(sigs, "id", "dh", path)
      // op succeeded despite degradation (advisory, not refusal)
      assert(IndexStore.loadMediaIndex(spark, path).members.count() == 4L)
      // ...and warned exactly ONCE for the store, not per acquire
      IndexStore.appendMediaIndex(Seq((10L, 0x9L)).toDF("id", "dh"),
        "id", "dh", path)
      assert(warnings.size == 1 &&
        warnings.head.contains("ADVISORY"), warnings.toString)
    } finally IndexStore.leaseWarnSink = prevSink
    // with the seam cleared, a real acquire on the healthy fs warns
    // nothing
    warnings.clear()
    IndexStore.leaseWarnSink = warnings += _
    try IndexStore.compactIndex(spark, path): Unit
    finally IndexStore.leaseWarnSink = prevSink
    assert(warnings.isEmpty, warnings.toString)
    // an INCONCLUSIVE probe (transient fs error at first acquire) must
    // not be memoized: the store re-probes on its next acquire, so a
    // degraded store still gets its warning instead of being
    // permanently marked probed-and-silent
    warnings.clear()
    IndexStore.leaseWarnSink = warnings += _
    try IndexStore.withLeaseProbeOutcome(None) {
      IndexStore.appendMediaIndex(Seq((11L, 0xAL)).toDF("id", "dh"),
        "id", "dh", path)
      assert(warnings.isEmpty, "inconclusive must stay silent")
      // same JVM-lifetime memo, same store: had the inconclusive run
      // been recorded, this degraded re-probe would be suppressed
      IndexStore.leaseProbeOverride = Some(Some(false))
      IndexStore.appendMediaIndex(Seq((12L, 0xBL)).toDF("id", "dh"),
        "id", "dh", path)
      assert(warnings.size == 1 &&
        warnings.head.contains("ADVISORY"), warnings.toString)
    } finally IndexStore.leaseWarnSink = prevSink
    // the memo is per STORE, not per filesystem: a second store on the
    // SAME local fs warns again (withLeaseProbe clears the memo on
    // entry, so the two stores below probe fresh)
    warnings.clear()
    IndexStore.leaseWarnSink = warnings += _
    try IndexStore.withLeaseProbe(false) {
      val p2 = tmp(); val p3 = tmp()
      IndexStore.saveMediaIndex(sigs, "id", "dh", p2)
      IndexStore.saveMediaIndex(sigs, "id", "dh", p3)
      assert(warnings.size == 2, warnings.toString)
    } finally IndexStore.leaseWarnSink = prevSink
  }

  test("generation manifest: a corrupt line raises a diagnosable error " +
      "naming the manifest, not a MatchError from inside a load") {
    val path = tmp()
    val sigs = (0L until 8L).map(i => (i, 0x1234L + i)).toDF("id", "dh")
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    IndexStore.compactIndex(spark, path): Unit
    val mf = new java.io.File(path, "_generations")
    new java.io.PrintWriter(mf) { write("members\nbands=1\n"); close() }
    new java.io.File(path, "._generations.crc").delete(): Unit
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadMediaIndex(spark, path)
    }
    assert(e.getMessage.contains("_generations") &&
      e.getMessage.contains("members"), e.getMessage)
    // a generation value OVERFLOWING Long is all digits — it must get
    // the same diagnosable raise, not a raw NumberFormatException
    new java.io.PrintWriter(mf) {
      write("members=99999999999999999999\nbands=1\n"); close()
    }
    new java.io.File(path, "._generations.crc").delete(): Unit
    val e2 = intercept[IllegalArgumentException] {
      IndexStore.loadMediaIndex(spark, path)
    }
    assert(e2.getMessage.contains("_generations") &&
      e2.getMessage.contains("99999999999999999999"), e2.getMessage)
  }

  test("append-commit fence: a REBUILD racing an append is caught through " +
      "meta/ even at generation 0, where generation numbers compare equal") {
    val path = tmp()
    val sigs = (0L until 8L).map(i => (i, 0x2222L * (i % 2) + i))
      .toDF("id", "dh")
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    // index still at generation 0: simulate a save* rebuild's FIRST
    // step (resetGenerations deletes meta/) landing inside the append's
    // resolve-to-commit window — the gen compare alone would pass 0 -> 0
    val e = IndexStore.withFenceHook(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path, "meta"))
    }) {
      intercept[IllegalStateException] {
        IndexStore.appendMediaIndex(
          Seq((99L, 0xABCDL)).toDF("id", "dh"), "id", "dh", path)
      }
    }
    assert(e.getMessage.contains("REBUILT") &&
      e.getMessage.contains("meta/"), e.getMessage)
    // the completed rebuild restores service and the append then lands
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    IndexStore.appendMediaIndex(
      Seq((99L, 0xABCDL)).toDF("id", "dh"), "id", "dh", path)
    assert(IndexStore.loadMediaIndex(spark, path).members.count() == 9)
  }

  test("rebuild crash window: meta is the commit record — a reset that " +
      "never completed fails loads loudly instead of serving stale gen 0") {
    val path = tmp()
    val sigs = (0L until 8L).map(i => (i, 0x4321L + i)).toDF("id", "dh")
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    IndexStore.compactIndex(spark, path): Unit
    // post-compact appends land in generation 1; generation 0 (the
    // retained plain dirs) is STALE — exactly what a reactivated gen 0
    // would silently serve
    IndexStore.appendMediaIndex(Seq((50L, 0x9999L)).toDF("id", "dh"),
      "id", "dh", path)
    // simulate resetGenerations crashing after its deletes, before the
    // rebuilding save* wrote anything: meta and manifest gone
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(path, "meta"))
    new java.io.File(path, "_generations").delete(): Unit
    new java.io.File(path, "._generations.crc").delete(): Unit
    intercept[Exception] { IndexStore.loadMediaIndex(spark, path) }
    // a completed rebuild restores service (meta written last)
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    assert(IndexStore.loadMediaIndex(spark, path).members.count() == 8)
  }

  test("checkIndex(ivf): referential and meta-label findings — " +
      "assignments without a centroid row, centroid count vs meta") {
    val path = tmp()
    IndexStore.saveIvf(IvfIndex.build(oldVecs, "vec_id", "embedding",
      nLists = 3, trainFraction = 1.0), path)
    assert(IndexStore.checkIndex(spark, path).isEmpty)
    // an assignment pointing at a list with no centroid: unreachable
    Seq((999L, 77)).toDF("id", "list_id")
      .write.mode("append").parquet(s"$path/assign")
    val f1 = IndexStore.checkIndex(spark, path)
    assert(f1.map(f => (f.table, f.check, f.severity)) ==
      Seq(("assign", "centroid-coverage", "unhealable")), s"$f1")
    // meta label drift (e.g. a crash between rebuildIvf's swap and its
    // meta rewrite): repairable, loads unaffected
    val m = IndexStore.readMeta(spark, path) + ("n_lists" -> "7")
    m.toSeq.toDF("key", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    val f2 = IndexStore.checkIndex(spark, path)
      .map(f => (f.table, f.check, f.severity)).toSet
    assert(f2 == Set(("assign", "centroid-coverage", "unhealable"),
      ("centroids", "count-vs-meta", "repairable")), s"$f2")
  }

  test("mergeTextIndexes: merge ≡ single build, table for table and " +
      "probe for probe; disjointness and path guards raise") {
    import graft.operators.TextAnalysis
    val all = oldDocs.unionByName(newDocs)
    val shardA = tmp(); val shardB = tmp(); val out = tmp()
    IndexStore.saveTextIndex(all.where(pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text", shardA)
    IndexStore.saveTextIndex(all.where(pmod(col("doc_id"), lit(2)) === 1),
      "doc_id", "text", shardB)
    val n = IndexStore.mergeTextIndexes(spark, Seq(shardA, shardB), out)
    assert(n == all.count(), "merged doc count must cover every shard")
    val rebuilt = tmp()
    IndexStore.saveTextIndex(all, "doc_id", "text", rebuilt)
    assert(canonIndex(out, Seq("postings", "doclen")) ==
      canonIndex(rebuilt, Seq("postings", "doclen")),
      "merge must equal a single undivided build — the text index " +
        "stores no corpus stat, so the union IS the index")
    val queries = Seq(1L -> "alpha beta", 2L -> "kappa zeta CHANGED")
    assert(canon(TextAnalysis.bm25TopKIndexed(
        IndexStore.loadTextIndex(spark, out), queries, 5)) ==
      canon(TextAnalysis.bm25TopK(all, "doc_id", "text", queries, 5)))
    // overlap: shard ids must be disjoint (a duplicated id would splice
    // two documents' statistics)
    val e = intercept[IllegalArgumentException] {
      IndexStore.mergeTextIndexes(spark, Seq(shardA, rebuilt), tmp())
    }
    assert(e.getMessage.contains("overlap"), e.getMessage)
    // guards: too few shards, duplicate shard, outPath among shards
    intercept[IllegalArgumentException] {
      IndexStore.mergeTextIndexes(spark, Seq(shardA), tmp())
    }
    intercept[IllegalArgumentException] {
      IndexStore.mergeTextIndexes(spark, Seq(shardA, shardA), tmp())
    }
    intercept[IllegalArgumentException] {
      IndexStore.mergeTextIndexes(spark, Seq(shardA, shardB), shardB)
    }
  }

  test("merge path guards see through spellings; merges hold the " +
      "shards' leases (a held shard lease refuses the merge, and the " +
      "merge refuses a concurrent shard appender)") {
    val shardA = tmp(); val shardB = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", shardA)
    IndexStore.saveTextIndex(newDocs, "doc_id", "text", shardB)
    // a trailing-slash respelling of a shard as outPath must still trip
    // the outPath-is-a-shard guard (paths are fs-qualified first)
    val eAlias = intercept[IllegalArgumentException] {
      IndexStore.mergeTextIndexes(spark, Seq(shardA, shardB), s"$shardB/")
    }
    assert(eAlias.getMessage.contains("outPath"), eAlias.getMessage)
    val eDup = intercept[IllegalArgumentException] {
      IndexStore.mergeTextIndexes(spark, Seq(shardA, s"$shardA/"), tmp())
    }
    assert(eDup.getMessage.contains("duplicate"), eDup.getMessage)
    // shard quiescence is ENFORCED, not assumed: with a writer holding
    // shard B's lease, the merge raises at acquire before reading a row
    val held = IndexStore.acquireIndexLease(spark, shardB, "appender")
    try {
      val eLease = intercept[IllegalStateException] {
        IndexStore.mergeTextIndexes(spark, Seq(shardA, shardB), tmp())
      }
      assert(eLease.getMessage.contains("lease"), eLease.getMessage)
    } finally IndexStore.releaseIndexLease(spark, shardB, held)
    // ...and leases release on the merge's own failure paths: the
    // outPath-guard raise above left no shard lease behind
    assert(IndexStore.readIndexLease(spark, shardA).isEmpty &&
      IndexStore.readIndexLease(spark, shardB).isEmpty,
      "a refused merge must leave no shard lease behind")
    // a clean merge still works end to end under the new leasing
    val out = tmp()
    assert(IndexStore.mergeTextIndexes(spark, Seq(shardA, shardB), out) ==
      oldDocs.count() + newDocs.count())
    assert(IndexStore.readIndexLease(spark, shardA).isEmpty &&
      IndexStore.readIndexLease(spark, shardB).isEmpty &&
      IndexStore.readIndexLease(spark, out).isEmpty,
      "a completed merge must release every lease it held")
  }

  test("withShardLeases: a shard lease stolen in the over-TTL window " +
      "raises BEFORE the output write (loud abort, not a silent " +
      "degradation to the fence backstops)") {
    val shardA = tmp(); val shardB = tmp(); val out = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", shardA)
    IndexStore.saveTextIndex(newDocs, "doc_id", "text", shardB)
    // simulate the documented interleaving: the merge outlives its TTL,
    // the shard lease expires and a second writer claims it (came-and-
    // went steals are equally caught — the verify compares OWNERS, and
    // a vanished file has none)
    IndexStore.shardLeaseTestHook = () => {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(s"file://$shardA"),
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(shardA,
        IndexStore.LeaseFile), false): Unit
      IndexStore.acquireIndexLease(spark, shardA, "stealer"): Unit
    }
    try {
      val e = intercept[IllegalStateException] {
        IndexStore.mergeTextIndexes(spark, Seq(shardA, shardB), out)
      }
      assert(e.getMessage.contains("stolen") &&
        e.getMessage.contains(shardA), e.getMessage)
    } finally IndexStore.shardLeaseTestHook = () => ()
    // the abort happened before ANY output table landed
    assert(!new java.io.File(out, "postings").exists() &&
      !new java.io.File(out, "meta").exists(),
      "a stolen-lease merge must not publish output tables")
    // the failing merge released its own leases (the stealer's lease
    // on shard A survives — it is not ours to delete)
    assert(IndexStore.readIndexLease(spark, shardB).isEmpty &&
      IndexStore.readIndexLease(spark, out).isEmpty)
    assert(IndexStore.readIndexLease(spark, shardA)
      .exists(_.op == "stealer"))
  }

  test("requireShardOwnership: disjointness by construction — owned " +
      "batches pass through, foreign/null/non-integral ids raise " +
      "naming samples, bad plans raise at the parameters") {
    val owned = Seq((4L, "a"), (14L, "b"), (24L, "c")).toDF("doc_id", "text")
    // shard 4 of 10 owns ids ≡ 4 (mod 10): pass-through, same rows
    assert(IndexStore.requireShardOwnership(owned, "doc_id", 4, 10)
      .collect().toSeq == owned.collect().toSeq)
    // the guard travels WITH the plan (raise_error at the consuming
    // scan — validates exactly the rows the build sees), so the raise
    // surfaces at action time wrapped in Spark's task failure
    def deepMessage(t: Throwable): String = {
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    }
    val eForeign = intercept[Exception] {
      IndexStore.requireShardOwnership(
        Seq((4L, "a"), (15L, "b")).toDF("doc_id", "text"),
        "doc_id", 4, 10).collect()
    }
    assert(deepMessage(eForeign).contains("15") &&
      deepMessage(eForeign).contains("does not belong"),
      deepMessage(eForeign))
    val eNull = intercept[Exception] {
      IndexStore.requireShardOwnership(
        Seq(Some(4L), None).map(v => (v, "x")).toDF("doc_id", "text"),
        "doc_id", 4, 10).collect()
    }
    assert(deepMessage(eNull).contains("does not belong"),
      deepMessage(eNull))
    val eStr = intercept[IllegalArgumentException] {
      IndexStore.requireShardOwnership(
        Seq(("k4", "a")).toDF("doc_id", "text"), "doc_id", 4, 10)
        .collect()
    }
    assert(eStr.getMessage.contains("non-integral"), eStr.getMessage)
    intercept[IllegalArgumentException] {
      IndexStore.requireShardOwnership(owned, "doc_id", 4, 1)
    }
    intercept[IllegalArgumentException] {
      IndexStore.requireShardOwnership(owned, "doc_id", 10, 10)
    }
    // the composed fleet shape: K owned builds merge with disjointness
    // guaranteed by construction (the proof then never fires)
    val sa = tmp(); val sb = tmp(); val out = tmp()
    val all = oldDocs
    IndexStore.saveTextIndex(IndexStore.requireShardOwnership(
      all.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", 0, 2),
      "doc_id", "text", sa)
    IndexStore.saveTextIndex(IndexStore.requireShardOwnership(
      all.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", 1, 2),
      "doc_id", "text", sb)
    assert(IndexStore.mergeTextIndexes(spark, Seq(sa, sb), out) ==
      all.count())
  }

  test("mergeTextIndexes: shard tombstones are applied, not carried — " +
      "the merged index equals a build over the LIVE union") {
    import graft.operators.TextAnalysis
    val shardA = tmp(); val shardB = tmp(); val out = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", shardA)
    IndexStore.saveTextIndex(newDocs, "doc_id", "text", shardB)
    IndexStore.deleteFromTextIndex(spark, shardA,
      Seq(3L, 18L).toDF("doc_id"))
    IndexStore.mergeTextIndexes(spark, Seq(shardA, shardB), out)
    val live = oldDocs.where(!col("doc_id").isin(3L, 18L))
      .unionByName(newDocs)
    val liveBuilt = tmp()
    IndexStore.saveTextIndex(live, "doc_id", "text", liveBuilt)
    assert(canonIndex(out, Seq("postings", "doclen")) ==
      canonIndex(liveBuilt, Seq("postings", "doclen")))
    // the merged output starts with a clean slate — no deletes table
    assert(!new java.io.File(out, "deletes").exists(),
      "shard graveyards must not transfer to the merged index")
  }

  test("deleteFromTextIndex: stat-exact at load — delete ≡ rebuild over " +
      "the live corpus, heavy tables physically untouched") {
    import graft.operators.TextAnalysis
    val path = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", path)
    val rawBefore = canonIndex(path, Seq("postings", "doclen"))
    val deleted = Seq(3L, 7L, 18L, 19L)
    assert(IndexStore.deleteFromTextIndex(spark, path,
      deleted.toDF("doc_id")) == 4L)
    // the heavy tables still hold every row (tombstones, not rewrite)
    assert(canonIndex(path, Seq("postings", "doclen")) == rawBefore,
      "delete must not rewrite the heavy tables")
    // but every probe sees corpus-minus-deleted with EXACT stats: the
    // loaded relations equal an index that never held the deleted docs
    val live = oldDocs.where(!col("doc_id").isin(deleted: _*))
    val liveBuilt = tmp()
    IndexStore.saveTextIndex(live, "doc_id", "text", liveBuilt)
    val queries = Seq(1L -> "alpha beta", 2L -> "kappa zeta")
    assert(canon(TextAnalysis.bm25TopKIndexed(
        IndexStore.loadTextIndex(spark, path), queries, 5)) ==
      canon(TextAnalysis.bm25TopKIndexed(
        IndexStore.loadTextIndex(spark, liveBuilt), queries, 5)),
      "deletion must shift N/df/avgdl exactly, immediately at load")
  }

  test("deleteFromTextIndex guards: empty set, duplicate ids, and ids " +
      "naming no live doc all raise; double delete raises") {
    val path = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", path)
    val eEmpty = intercept[IllegalArgumentException] {
      IndexStore.deleteFromTextIndex(spark, path,
        Seq.empty[Long].toDF("doc_id"))
    }
    assert(eEmpty.getMessage.contains("empty"), eEmpty.getMessage)
    val eDup = intercept[IllegalArgumentException] {
      IndexStore.deleteFromTextIndex(spark, path,
        Seq(3L, 3L).toDF("doc_id"))
    }
    assert(eDup.getMessage.contains("duplicate"), eDup.getMessage)
    val eMiss = intercept[IllegalArgumentException] {
      IndexStore.deleteFromTextIndex(spark, path,
        Seq(3L, 999L).toDF("doc_id"))
    }
    assert(eMiss.getMessage.contains("999") &&
      eMiss.getMessage.contains("LIVE"), eMiss.getMessage)
    // a NULL id (a join that missed upstream; under non-ANSI sessions
    // also a failed cast) gets a dedicated raise BEFORE the
    // duplicate/liveness checks — count_distinct ignores nulls, so
    // without it the raise would report phantom duplicates
    val eNull = intercept[IllegalArgumentException] {
      IndexStore.deleteFromTextIndex(spark, path,
        Seq(Some(7L), None).map(v => Tuple1(v)).toDF("doc_id"))
    }
    assert(eNull.getMessage.contains("NULL id(s)"), eNull.getMessage)
    // nothing was tombstoned by the failed calls
    IndexStore.deleteFromTextIndex(spark, path, Seq(3L).toDF("doc_id"))
    // an already-deleted id is no longer live — a repeat raises too
    val eTwice = intercept[IllegalArgumentException] {
      IndexStore.deleteFromTextIndex(spark, path, Seq(3L).toDF("doc_id"))
    }
    assert(eTwice.getMessage.contains("LIVE"), eTwice.getMessage)
  }

  test("replaceTextDocs: replace ≡ delete + fresh-id append table for " +
      "table; fresh-id and mix guards raise; the crash window between " +
      "tombstone and append retries to completion") {
    val path = tmp(); val twin = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", path)
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", twin)
    val repl = Seq((200L, sentence(25)), (201L, sentence(25)))
      .toDF("doc_id", "text")
    assert(IndexStore.replaceTextDocs(repl, "doc_id", "text", path,
      Seq(3L, 5L).toDF("doc_id")) == ((2L, 2L)))
    // the composition is exactly its parts: tombstone + append
    IndexStore.deleteFromTextIndex(spark, twin, Seq(3L, 5L).toDF("doc_id"))
    IndexStore.appendTextIndex(repl, "doc_id", "text", twin)
    val ts = Seq("postings", "doclen", "deletes")
    assert(canonIndex(path, ts) == canonIndex(twin, ts))
    // fresh-id guard: a live id, and a tombstoned (never-reusable) id
    val eLive = intercept[IllegalArgumentException] {
      IndexStore.replaceTextDocs(
        Seq((7L, sentence(25))).toDF("doc_id", "text"),
        "doc_id", "text", path, Seq(9L).toDF("doc_id"))
    }
    assert(eLive.getMessage.contains("FRESH"), eLive.getMessage)
    val eDead = intercept[IllegalArgumentException] {
      IndexStore.replaceTextDocs(
        Seq((3L, sentence(25))).toDF("doc_id", "text"),
        "doc_id", "text", path, Seq(9L).toDF("doc_id"))
    }
    assert(eDead.getMessage.contains("FRESH"), eDead.getMessage)
    // crash window: the tombstone landed but the append never ran —
    // the retry classifies old ids as all-dead/new absent and finishes,
    // and the append-only path WARNS (it cannot distinguish a genuine
    // retry from an append onto an unrelated takedown's tombstones —
    // the audit trail is the warning)
    IndexStore.deleteFromTextIndex(spark, path, Seq(9L).toDF("doc_id"))
    val repl2 = Seq((210L, sentence(25))).toDF("doc_id", "text")
    val retryWarnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val prevSink = IndexStore.leaseWarnSink
    IndexStore.leaseWarnSink = retryWarnings += _
    try assert(IndexStore.replaceTextDocs(repl2, "doc_id", "text", path,
      Seq(9L).toDF("doc_id")) == ((0L, 1L)))
    finally IndexStore.leaseWarnSink = prevSink
    assert(retryWarnings.size == 1 &&
      retryWarnings.head.contains("CRASH-RETRY"), retryWarnings.toString)
    // ...and the classification is also DURABLE (round-16 ADVICE): one
    // audit row beside the deletes table survives the process even when
    // the warn sink drops stderr; fresh-run replaces write none (the
    // first replace above is the control)
    val audit = spark.read.parquet(s"$path/crash_retries").collect()
    assert(audit.length == 1, audit.mkString(","))
    assert(audit.head.getAs[String]("op") == "replaceTextDocs" &&
      audit.head.getAs[Long]("n_old") == 1L &&
      audit.head.getAs[Long]("n_new") == 1L, audit.head.toString)
    assert(spark.read.parquet(
        IndexStore.tableDir(spark, path, "doclen"))
      .where(col("doc_id") === 210L).count() == 1L)
    // a COMPLETE replace re-run raises (new ids now present) instead
    // of double-appending
    val eDone = intercept[IllegalArgumentException] {
      IndexStore.replaceTextDocs(repl2, "doc_id", "text", path,
        Seq(9L).toDF("doc_id"))
    }
    assert(eDone.getMessage.contains("FRESH"), eDone.getMessage)
    // mix guard: one live + one tombstoned old id is neither a fresh
    // run nor a clean retry
    val eMix = intercept[IllegalArgumentException] {
      IndexStore.replaceTextDocs(
        Seq((220L, sentence(25))).toDF("doc_id", "text"),
        "doc_id", "text", path, Seq(9L, 11L).toDF("doc_id"))
    }
    assert(eMix.getMessage.contains("MIX"), eMix.getMessage)
    // empty sides raise
    val eOld = intercept[IllegalArgumentException] {
      IndexStore.replaceTextDocs(
        Seq((230L, sentence(25))).toDF("doc_id", "text"),
        "doc_id", "text", path, Seq.empty[Long].toDF("doc_id"))
    }
    assert(eOld.getMessage.contains("empty oldIds"), eOld.getMessage)
    val eNew = intercept[IllegalArgumentException] {
      IndexStore.replaceTextDocs(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "doc_id", "text", path, Seq(11L).toDF("doc_id"))
    }
    assert(eNew.getMessage.contains("empty replacement"), eNew.getMessage)
    // a NULL replacement id would pass the freshness join vacuously
    // (null keys match nothing), erase the old docs, and append rows
    // no takedown could ever name: the dedicated raise fires BEFORE
    // anything mutates (mirror of the delete-side NULL guard)
    val eNullNew = intercept[IllegalArgumentException] {
      IndexStore.replaceTextDocs(
        Seq((Option.empty[Long], sentence(25))).toDF("doc_id", "text"),
        "doc_id", "text", path, Seq(11L).toDF("doc_id"))
    }
    assert(eNullNew.getMessage.contains("NULL") &&
      eNullNew.getMessage.contains("nothing was tombstoned"),
      eNullNew.getMessage)
    assert(spark.read.parquet(
        IndexStore.tableDir(spark, path, "doclen"))
      .where(col("doc_id") === 11L).count() == 1L,
      "the refused replace must leave doc 11 live")
    // the whole composition runs under ONE lease — a held lease
    // refuses it at acquire
    val lease = IndexStore.acquireIndexLease(spark, path, "spec")
    try {
      val eLease = intercept[IllegalStateException] {
        IndexStore.replaceTextDocs(
          Seq((240L, sentence(25))).toDF("doc_id", "text"),
          "doc_id", "text", path, Seq(11L).toDF("doc_id"))
      }
      assert(eLease.getMessage.contains("lease"), eLease.getMessage)
    } finally IndexStore.releaseIndexLease(spark, path, lease)
  }

  test("replace* kind parity: media/vector/corpus/ivf rectification ≡ " +
      "delete + fresh-id append, table for table, each under one lease") {
    // media
    val sigs = (0L until 8L).map(i => (i, 0x100L + i)).toDF("id", "dh")
    val mp = tmp(); val mt = tmp()
    IndexStore.saveMediaIndex(sigs, "id", "dh", mp)
    IndexStore.saveMediaIndex(sigs, "id", "dh", mt)
    val mRepl = Seq((100L, 0x900L), (101L, 0x901L)).toDF("id", "dh")
    assert(IndexStore.replaceMediaAssets(mRepl, "id", "dh", mp,
      Seq(2L, 5L).toDF("id")) == ((2L, 2L)))
    IndexStore.deleteFromMediaIndex(spark, mt, Seq(2L, 5L).toDF("id"))
    IndexStore.appendMediaIndex(mRepl, "id", "dh", mt)
    val mTs = Seq("members", "bands", "deletes")
    assert(canonIndex(mp, mTs) == canonIndex(mt, mTs), "media twin")
    // vector
    val vp = tmp(); val vt = tmp()
    IndexStore.saveVectorIndex(oldVecs, "vec_id", "embedding", vp, dim = 8)
    IndexStore.saveVectorIndex(oldVecs, "vec_id", "embedding", vt, dim = 8)
    val vRepl = Seq((200L, vec(1, 8)), (201L, vec(2, 8)))
      .toDF("vec_id", "embedding")
    assert(IndexStore.replaceVectorMembers(vRepl, "vec_id", "embedding",
      vp, Seq(3L, 5L).toDF("vec_id")) == ((2L, 2L)))
    IndexStore.deleteFromVectorIndex(spark, vt, Seq(3L, 5L).toDF("vec_id"))
    IndexStore.appendVectorIndex(vRepl, "vec_id", "embedding", vt)
    val vTs = Seq("members", "reps", "blocks", "deletes")
    assert(canonIndex(vp, vTs) == canonIndex(vt, vTs), "vector twin")
    // corpus
    val cp = tmp(); val ct = tmp()
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", cp)
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", ct)
    val cRepl = Seq((200L, sentence(25))).toDF("doc_id", "text")
    assert(IndexStore.replaceCorpusDocs(cRepl, "doc_id", "text", cp,
      Seq(7L).toDF("doc_id")) == ((1L, 1L)))
    IndexStore.deleteFromCorpusIndex(spark, ct, Seq(7L).toDF("doc_id"))
    IndexStore.appendCorpusIndex(cRepl, "doc_id", "text", ct)
    val cTs = Seq("members", "sets", "bands", "deletes")
    assert(canonIndex(cp, cTs) == canonIndex(ct, cTs), "corpus twin")
    // ivf (frozen centroids — replacement assigned, never retrained)
    val ip = tmp(); val it = tmp()
    val model = IvfIndex.build(oldVecs, "vec_id", "embedding",
      nLists = 3, trainFraction = 1.0)
    IndexStore.saveIvf(model, ip)
    IndexStore.saveIvf(model, it)
    val iRepl = Seq((300L, vec(0, 7))).toDF("vec_id", "embedding")
    assert(IndexStore.replaceIvfMembers(iRepl, "vec_id", "embedding",
      ip, Seq(4L).toDF("vec_id")) == ((1L, 1L)))
    IndexStore.deleteFromIvf(spark, it, Seq(4L).toDF("vec_id"))
    IndexStore.appendIvf(iRepl, "vec_id", "embedding", it)
    assert(canonIndex(ip, Seq("assign", "deletes")) ==
      canonIndex(it, Seq("assign", "deletes")), "ivf twin")
    // one shared core ⇒ the guards hold everywhere: spot-check the
    // reused-id raise on a non-text kind
    val eReuse = intercept[IllegalArgumentException] {
      IndexStore.replaceMediaAssets(
        Seq((2L, 0x777L)).toDF("id", "dh"), "id", "dh", mp,
        Seq(3L).toDF("id"))
    }
    assert(eReuse.getMessage.contains("FRESH"), eReuse.getMessage)
  }

  test("vacuumTextIndex: folds tombstoned rows out, keeps probes " +
      "identical and the graveyard intact; deleted max-id range stays " +
      "unreusable after the fold") {
    import graft.operators.TextAnalysis
    val path = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", path)
    // delete the MAX ids — the case where only the graveyard keeps the
    // monotone guard honest after their rows leave the heavy tables
    IndexStore.deleteFromTextIndex(spark, path,
      Seq(17L, 18L, 19L).toDF("doc_id"))
    val before = canon(TextAnalysis.bm25TopKIndexed(
      IndexStore.loadTextIndex(spark, path),
      Seq(1L -> "alpha beta", 2L -> "kappa zeta"), 5))
    assert(IndexStore.vacuumTextIndex(spark, path) == 3L)
    // physically gone from the ACTIVE generation now
    val rawIds = spark.read
      .parquet(IndexStore.tableDir(spark, path, "doclen"))
      .select("doc_id").as[Long].collect().toSet
    assert(!rawIds.exists(_ >= 17L), "vacuum must fold the rows out")
    // vacuum ≡ fresh build over the live corpus, table for table
    val liveBuilt = tmp()
    IndexStore.saveTextIndex(oldDocs.where(col("doc_id") < 17),
      "doc_id", "text", liveBuilt)
    assert(canonIndex(path, Seq("postings", "doclen")) ==
      canonIndex(liveBuilt, Seq("postings", "doclen")))
    // probe results unchanged by the fold (loads already anti-joined)
    val after = canon(TextAnalysis.bm25TopKIndexed(
      IndexStore.loadTextIndex(spark, path),
      Seq(1L -> "alpha beta", 2L -> "kappa zeta"), 5))
    assert(after == before && before.nonEmpty,
      "vacuum reclaims space, never changes semantics")
    // second vacuum: nothing left to fold
    assert(IndexStore.vacuumTextIndex(spark, path) == 0L)
    // the graveyard keeps the deleted range unreusable: without the
    // deletes union the surviving max (16) would re-open 17-19
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendTextIndex(Seq((18L, sentence(10)))
        .toDF("doc_id", "text"), "doc_id", "text", path)
    }
    assert(e.getMessage.contains("monotone"), e.getMessage)
    // and the lifecycle continues above the graveyard
    IndexStore.appendTextIndex(newDocs, "doc_id", "text", path)
    assert(IndexStore.loadTextIndex(spark, path).doclen.count() ==
      17L + newDocs.count())
  }

  test("text tombstones survive compaction; describeIndex lists the " +
      "deletes table; vacuum swaps retain a pinned reader's generation") {
    import graft.operators.TextAnalysis
    val path = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", path)
    IndexStore.deleteFromTextIndex(spark, path,
      Seq(3L, 7L).toDF("doc_id"))
    val queries = Seq(1L -> "alpha beta", 2L -> "kappa zeta")
    val before = canon(TextAnalysis.bm25TopKIndexed(
      IndexStore.loadTextIndex(spark, path), queries, 5))
    // compaction rewrites ALL tables present — deletes included — and
    // changes nothing semantically
    val stats = IndexStore.compactIndex(spark, path)
    assert(stats.map(_.table).toSet == Set("postings", "doclen", "deletes"),
      s"optional deletes must compact once present: $stats")
    assert(canon(TextAnalysis.bm25TopKIndexed(
      IndexStore.loadTextIndex(spark, path), queries, 5)) == before)
    assert(IndexStore.describeIndex(spark, path)
      .exists(t => t.table == "deletes" && t.files > 0))
    // a reader pinned before the vacuum keeps its generation's files
    val pinned = IndexStore.loadTextIndex(spark, path)
    assert(IndexStore.vacuumTextIndex(spark, path) == 2L)
    assert(canon(TextAnalysis.bm25TopKIndexed(pinned, queries, 5)) ==
      before, "pinned reader must survive the vacuum swap")
    // an index that never saw a delete: vacuum is a no-op, compaction
    // reports only the mandatory tables
    val fresh = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", fresh)
    assert(IndexStore.vacuumTextIndex(spark, fresh) == 0L)
    assert(IndexStore.compactIndex(spark, fresh).map(_.table).toSet ==
      Set("postings", "doclen"))
  }

  test("media tombstones: a deleted asset never surfaces (probes ≡ a " +
      "live-only rebuild); vacuum folds members and prunes dead " +
      "families' bands; the graveyard blocks id reuse after the fold") {
    val path = tmp()
    // two exact-dup families ({1,2} at h1, {10,11} at h2) + a singleton
    val sigs = Seq((1L, 0x1111L), (2L, 0x1111L), (10L, 0x2222L),
      (11L, 0x2222L), (20L, 0x3333L)).toDF("id", "dh")
    IndexStore.saveMediaIndex(sigs, "id", "dh", path)
    // delete ONE member of family h1, the WHOLE family h2, and the
    // MAX-id singleton (so only the graveyard can fence its range)
    assert(IndexStore.deleteFromMediaIndex(spark, path,
      Seq(2L, 10L, 11L, 20L).toDF("id")) == 4L)
    val probe = Seq((100L, 0x1111L), (101L, 0x2222L)).toDF("id", "dh")
    def screen(p: String) = canon(Dedup.hammingJoinIndexed(probe,
      IndexStore.loadMediaIndex(spark, p), "id", "dh", maxDist = 3))
    val live = tmp()
    IndexStore.saveMediaIndex(Seq((1L, 0x1111L)).toDF("id", "dh"),
      "id", "dh", live)
    assert(screen(path) == screen(live) && screen(path).nonEmpty,
      "tombstoned assets must be invisible to every screen immediately")
    // vacuum: members fold; the dead families' band rows prune; h1's
    // stay (member 1 survives)
    assert(IndexStore.vacuumMediaIndex(spark, path) == 4L)
    assert(canonIndex(path, Seq("members", "bands")) ==
      canonIndex(live, Seq("members", "bands")),
      "vacuum ≡ fresh build over the live assets")
    assert(screen(path) == screen(live))
    assert(IndexStore.vacuumMediaIndex(spark, path) == 0L)
    // graveyard: the surviving max id is 1, so only the deletes union
    // keeps the folded 2..20 range unreusable
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendMediaIndex(Seq((11L, 0x4444L)).toDF("id", "dh"),
        "id", "dh", path)
    }
    assert(e.getMessage.contains("monotone"), e.getMessage)
    IndexStore.appendMediaIndex(Seq((30L, 0x4444L)).toDF("id", "dh"),
      "id", "dh", path)
    assert(IndexStore.loadMediaIndex(spark, path).members.count() == 2L)
  }

  test("vector tombstones: member-grain deletes hide even a family's " +
      "rep id while its exact-dup twins keep matching; vacuum prunes " +
      "dead families' reps/blocks; raw-members coverage stays green") {
    val path = tmp()
    // family {0, 100} holds EXACT-dup vectors (rep = 0); the rest are
    // singletons — delete the REP id 0 and the whole singleton 3
    IndexStore.saveVectorIndex(oldVecs, "vec_id", "embedding", path, dim = 8)
    IndexStore.appendVectorIndex(newVecs, "vec_id", "embedding", path)
    assert(IndexStore.deleteFromVectorIndex(spark, path,
      Seq(0L, 3L).toDF("vec_id")) == 2L)
    // the load-time coverage identity runs on RAW members: a
    // fully-deleted group is a tombstone state, not a torn append
    val idx = IndexStore.loadVectorIndex(spark, path)
    val probe = oldVecs.where(col("vec_id") === 0)
    def matches(i: Similarity.VectorIndex) =
      Similarity.cosineJoinIndexed(i, probe, "vec_id", "embedding",
        dim = 8, threshold = 0.999).collect().map(_.getLong(1)).toSet
    // rep 0 deleted, but its exact-dup twin 100 still matches through
    // the same (internal) rep row
    assert(matches(idx).contains(100L) && !matches(idx).contains(0L))
    // vacuum folds and prunes; probes unchanged; a live-only rebuild
    // agrees probe-for-probe (table identity is NOT expected: the
    // fresh build elects 100 as its own rep — an internal label)
    assert(IndexStore.vacuumVectorIndex(spark, path) == 2L)
    val live = tmp()
    IndexStore.saveVectorIndex(
      oldVecs.where(!col("vec_id").isin(0L, 3L)).unionByName(newVecs),
      "vec_id", "embedding", live, dim = 8)
    val after = IndexStore.loadVectorIndex(spark, path)
    assert(matches(after) == matches(IndexStore.loadVectorIndex(spark, live)))
    // singleton 3's family died: its reps/blocks rows are pruned
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "reps"))
      .where(col("rep_id") === 3).count() == 0L)
    // family {0,100} survives through member 100 under rep 0's row
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "reps"))
      .where(col("rep_id") === 0).count() == 1L)
    assert(IndexStore.vacuumVectorIndex(spark, path) == 0L)
  }

  test("corpus tombstones: deleting a family's rep id keeps its " +
      "exact-text twins matching; a dead family REVIVES when the same " +
      "text is legitimately re-admitted; vacuum prunes dead sets/bands") {
    val path = tmp()
    // oldDocs: family {3, 18, 19} shares base(3)'s text (rep = 3)
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", path)
    val famText = oldDocs.where(col("doc_id") === 3)
      .select("text").as[String].head()
    // delete the rep and one twin; the third twin keeps matching
    assert(IndexStore.deleteFromCorpusIndex(spark, path,
      Seq(3L, 18L).toDF("doc_id")) == 2L)
    val probe = Seq((900L, famText)).toDF("doc_id", "text")
    def matches(p: String) = Dedup.minhashLSHJoinIndexed(probe,
        IndexStore.loadCorpusIndex(spark, p), "doc_id", "text")
      .collect().map(_.getLong(1)).toSet
    assert(matches(path) == Set(19L),
      s"only the surviving twin must match, got ${matches(path)}")
    // delete the last twin: the family is dead — and REVIVES when the
    // same text is re-admitted under a fresh id (the content was
    // erased and legitimately re-enters; stored shingles still
    // describe it exactly)
    assert(IndexStore.deleteFromCorpusIndex(spark, path,
      Seq(19L).toDF("doc_id")) == 1L)
    assert(matches(path).isEmpty)
    IndexStore.appendCorpusIndex(Seq((200L, famText)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    assert(matches(path) == Set(200L))
    // delete the revival too, vacuum: the family's sets/bands prune
    IndexStore.deleteFromCorpusIndex(spark, path, Seq(200L).toDF("doc_id"))
    assert(IndexStore.vacuumCorpusIndex(spark, path) == 4L)
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "sets"))
      .where(col("corpus_id") === 3).count() == 0L)
    assert(matches(path).isEmpty)
    // post-vacuum lifecycle continues above the graveyard
    intercept[IllegalArgumentException] {
      IndexStore.appendCorpusIndex(
        Seq((19L, sentence(20))).toDF("doc_id", "text"),
        "doc_id", "text", path)
    }
    IndexStore.appendCorpusIndex(
      Seq((300L, sentence(20))).toDF("doc_id", "text"),
      "doc_id", "text", path)
  }

  test("edges: merging an EMPTY shard is exact (a 100 TB id range can " +
      "legitimately hold no docs); deleting EVERY doc leaves a valid " +
      "empty-probe index that still ingests and vacuums") {
    import graft.operators.TextAnalysis
    val a = tmp(); val b = tmp(); val out = tmp(); val rebuilt = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", a)
    IndexStore.saveTextIndex(oldDocs.limit(0), "doc_id", "text", b)
    IndexStore.mergeTextIndexes(spark, Seq(a, b), out)
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", rebuilt)
    assert(canonIndex(out, Seq("postings", "doclen")) ==
      canonIndex(rebuilt, Seq("postings", "doclen")))
    // total deletion: probes return empty (stats over the empty live
    // set never divide), ingest admits everything, vacuum folds all
    val p = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", p)
    assert(IndexStore.deleteFromTextIndex(spark, p,
      oldDocs.select("doc_id")) == oldDocs.count())
    assert(TextAnalysis.bm25ScreenIndexed(
      IndexStore.loadTextIndex(spark, p),
      Seq(1L -> "alpha beta"), 1L).count() == 0L)
    val v = IndexStore.ingestText(newDocs, "doc_id", "text", p,
      minScoreE6 = 1L)
    assert(v.where(col("status") === "admitted").count() ==
      newDocs.count(), "nothing live can match — everything admits")
    assert(IndexStore.vacuumTextIndex(spark, p) == oldDocs.count())
    // the re-grown index holds exactly the new batch
    assert(IndexStore.loadTextIndex(spark, p).doclen.count() ==
      newDocs.count())
  }

  test("deleteFromIndex/vacuumIndex dispatch on the stored kind and " +
      "match the per-kind ops; unknown/absent kind raises") {
    val path = tmp()
    IndexStore.saveMediaIndex(
      Seq((1L, 0xAAL), (2L, 0xBBL)).toDF("id", "dh"), "id", "dh", path)
    assert(IndexStore.deleteFromIndex(spark, path,
      Seq(1L).toDF("id")) == 1L)
    assert(IndexStore.loadMediaIndex(spark, path).members.count() == 1L)
    assert(IndexStore.vacuumIndex(spark, path) == 1L)
    assert(IndexStore.vacuumIndex(spark, path) == 0L)
    val t = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", t)
    assert(IndexStore.deleteFromIndex(spark, t,
      Seq(3L, 4L).toDF("doc_id")) == 2L)
    assert(IndexStore.vacuumIndex(spark, t) == 2L)
    // the replace twin dispatches the same way (media path here — the
    // per-kind semantics are the replace* specs' job)
    assert(IndexStore.replaceInIndex(spark, path,
      Seq((50L, 0xCCL)).toDF("id", "dh"), "id", "dh",
      Seq(2L).toDF("id")) == ((1L, 1L)))
    assert(IndexStore.loadMediaIndex(spark, path).members
      .select("member_id").as[Long].collect().toSet == Set(50L))
    intercept[Exception] {
      IndexStore.deleteFromIndex(spark, tmp(), Seq(1L).toDF("id"))
    }
    intercept[Exception] {
      IndexStore.replaceInIndex(spark, tmp(),
        Seq((60L, 0xDDL)).toDF("id", "dh"), "id", "dh",
        Seq(50L).toDF("id"))
    }
  }

  test("mergeIndexes dispatches on the first shard's kind; a mixed " +
      "shard list raises at the kind-specific validation; IVF is " +
      "refused with the rebuildIvf pointer") {
    // media routing: dispatcher result ≡ the kind-specific merge
    val a = tmp(); val b = tmp(); val out = tmp(); val outDirect = tmp()
    IndexStore.saveMediaIndex(
      Seq((1L, 0xAAL), (2L, 0xBBL)).toDF("id", "dh"), "id", "dh", a)
    IndexStore.saveMediaIndex(
      Seq((3L, 0xCCL)).toDF("id", "dh"), "id", "dh", b)
    assert(IndexStore.mergeIndexes(spark, Seq(a, b), out) == 3L)
    IndexStore.mergeMediaIndexes(spark, Seq(a, b), outDirect): Unit
    assert(canonIndex(out, Seq("members", "bands")) ==
      canonIndex(outDirect, Seq("members", "bands")))
    // text routing rides the same meta
    val t1 = tmp(); val t2 = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", t1)
    IndexStore.saveTextIndex(newDocs, "doc_id", "text", t2)
    assert(IndexStore.mergeIndexes(spark, Seq(t1, t2), tmp()) ==
      oldDocs.count() + newDocs.count())
    // mixed kinds: dispatched by the FIRST shard, the second raises in
    // the kind-specific merge's own meta validation
    intercept[Exception] {
      IndexStore.mergeIndexes(spark, Seq(a, t1), tmp())
    }
    // IVF: refused by design, pointing at the documented path
    val iv = tmp()
    IndexStore.saveIvf(IvfIndex.build(oldVecs, "vec_id", "embedding",
      nLists = 2, trainFraction = 1.0), iv)
    val eIvf = intercept[IllegalArgumentException] {
      IndexStore.mergeIndexes(spark, Seq(iv, iv), tmp())
    }
    assert(eIvf.getMessage.contains("rebuildIvf"), eIvf.getMessage)
    // kindless path raises naming the meta
    intercept[Exception] {
      IndexStore.mergeIndexes(spark, Seq(tmp(), a), tmp())
    }
  }

  test("mergeMediaIndexes: merge ≡ single build table for table — band " +
      "rows deduped across shards, a torn shard's members-without-bands " +
      "healed by the re-derivation; overlapping shard ids raise") {
    val a = tmp(); val b = tmp(); val out = tmp(); val rebuilt = tmp()
    val sA = Seq((1L, 0x11L), (2L, 0x22L)).toDF("id", "dh")
    // 0x11 lives in BOTH shards: its band rows arrive twice and must
    // come out once (bands hold each signature exactly once)
    val sB = Seq((10L, 0x11L), (11L, 0x33L)).toDF("id", "dh")
    IndexStore.saveMediaIndex(sA, "id", "dh", a)
    IndexStore.saveMediaIndex(sB, "id", "dh", b)
    // torn shard state: a member row whose bands append was lost
    Seq((0x44L, 12L)).toDF("dh", "member_id")
      .write.mode("append").parquet(s"$b/members")
    IndexStore.mergeMediaIndexes(spark, Seq(a, b), out)
    IndexStore.saveMediaIndex(
      sA.unionByName(sB).unionByName(Seq((12L, 0x44L)).toDF("id", "dh")),
      "id", "dh", rebuilt)
    assert(canonIndex(out, Seq("members", "bands")) ==
      canonIndex(rebuilt, Seq("members", "bands")),
      "merge must equal a single undivided build, torn shard healed")
    val e = intercept[IllegalArgumentException] {
      IndexStore.mergeMediaIndexes(spark, Seq(a, rebuilt), tmp())
    }
    assert(e.getMessage.contains("overlap"), e.getMessage)
  }

  test("mergeVectorIndexes: cross-shard exact-dup families consolidate " +
      "to the single build's rep (min member id); geometry mismatch " +
      "raises") {
    val a = tmp(); val b = tmp(); val out = tmp(); val rebuilt = tmp()
    // the same vector value split across shards: each shard elected
    // its own rep (2 and 100) — the merge must re-elect the global min
    val vA = Seq((2L, vec(0, 0)), (5L, vec(0, 0)), (7L, vec(1, 0)))
      .toDF("vec_id", "embedding")
    val vB = Seq((100L, vec(0, 0)), (101L, vec(2, 0)))
      .toDF("vec_id", "embedding")
    IndexStore.saveVectorIndex(vA, "vec_id", "embedding", a, dim = 8)
    IndexStore.saveVectorIndex(vB, "vec_id", "embedding", b, dim = 8)
    IndexStore.mergeVectorIndexes(spark, Seq(a, b), out)
    IndexStore.saveVectorIndex(vA.unionByName(vB), "vec_id", "embedding",
      rebuilt, dim = 8)
    val ts = Seq("blocks", "reps", "members")
    assert(canonIndex(out, ts) == canonIndex(rebuilt, ts),
      "consolidated merge must equal a single undivided build")
    assert(spark.read.parquet(IndexStore.tableDir(spark, out, "members"))
      .where(col("rep_id") === 2).count() == 3L,
      "the cross-shard family must re-key to the global min member")
    val c = tmp()
    IndexStore.saveVectorIndex(vB, "vec_id", "embedding", c,
      dim = 8, numBlocks = 4)
    val e = intercept[IllegalArgumentException] {
      IndexStore.mergeVectorIndexes(spark, Seq(a, c), tmp())
    }
    assert(e.getMessage.contains("geometry"), e.getMessage)
  }

  test("mergeCorpusIndexes: cross-shard exact-text families " +
      "consolidate; shard tombstones applied, not carried; LSH " +
      "parameter mismatch raises") {
    val a = tmp(); val b = tmp(); val out = tmp(); val rebuilt = tmp()
    // newDocs 100/104 duplicate oldDocs 7's text — the family spans
    // the shards; 104 is tombstoned in its shard pre-merge
    IndexStore.saveCorpusIndex(oldDocs, "doc_id", "text", a)
    IndexStore.saveCorpusIndex(newDocs, "doc_id", "text", b)
    IndexStore.deleteFromCorpusIndex(spark, b, Seq(104L).toDF("doc_id"))
    IndexStore.mergeCorpusIndexes(spark, Seq(a, b), out)
    IndexStore.saveCorpusIndex(
      oldDocs.unionByName(newDocs.where(col("doc_id") =!= 104)),
      "doc_id", "text", rebuilt)
    val ts = Seq("bands", "sets", "members")
    assert(canonIndex(out, ts) == canonIndex(rebuilt, ts),
      "merge must equal a single build over the LIVE union")
    assert(spark.read.parquet(IndexStore.tableDir(spark, out, "members"))
      .where(col("corpus_id") === 7).count() == 2L,
      "the cross-shard family holds 7 and 100 (104 was tombstoned)")
    val c = tmp()
    IndexStore.saveCorpusIndex(newDocs, "doc_id", "text", c, numBands = 8)
    val e = intercept[IllegalArgumentException] {
      IndexStore.mergeCorpusIndexes(spark, Seq(a, c), tmp())
    }
    assert(e.getMessage.contains("LSH"), e.getMessage)
  }

  test("ingestText maxScorePrune: the guardrail budgets the TRUE " +
      "candidate-restricted volume — a batch whose UNPRUNED estimate " +
      "refuses passes under the same budget with identical verdicts") {
    val path = tmp()
    val dense = "apple banana cherry date elder fig grape honey iris juniper"
    val corpus = (0L until 8L).map(i => (i, s"$dense tag$i"))
      .toDF("doc_id", "text")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    val batch = (100L until 116L).map(i => (i, s"$dense tag0"))
      .toDF("doc_id", "text")
    // unpruned: the 1296-pair estimate refuses a 200-pair budget
    intercept[IllegalStateException] {
      IndexStore.ingestText(batch, "doc_id", "text", path,
        minScoreE6 = 1300000L, maxScreenPairs = 200L)
    }
    // pruned: at this threshold the ten dense terms' ub-sum
    // (10 × ⌊ln(1+0.5/8.5)·2.2e6⌋ ≈ 1.257M) stays under 1.3M, so only
    // tag0 is essential — candidates = {doc 0}, restricted volume
    // 11 × 16 = 176 ≤ 200, and the round completes under the SAME
    // budget the raw batch violated
    val v = IndexStore.ingestText(batch, "doc_id", "text", path,
        minScoreE6 = 1300000L, maxScreenPairs = 200L,
        maxScorePrune = true)
      .orderBy("doc_id").collect()
    assert(v.length == 16 && v.forall(r =>
      r.getString(1) == "duplicate" && r.getLong(3) == 0L), v.toSeq)
    // bit-identical to the unpruned run under a generous budget
    // (all-duplicate rounds append nothing, so the index is unchanged)
    val big = IndexStore.ingestText(batch, "doc_id", "text", path,
        minScoreE6 = 1300000L)
      .orderBy("doc_id").collect()
    assert(v.map(_.toString).toSeq == big.map(_.toString).toSeq)
  }

  test("bm25 maxScorePrune is LOSSLESS: screens and ingest rounds are " +
      "bit-identical with the prune on or off, across thresholds (all-" +
      "candidate, partial, impossible) and composed with maxDfPpm") {
    import graft.operators.TextAnalysis
    val path = tmp()
    IndexStore.saveTextIndex(oldDocs.unionByName(newDocs),
      "doc_id", "text", path)
    val idx = IndexStore.loadTextIndex(spark, path)
    val queries = Seq(
      1L -> "alpha beta gamma delta", // all common vocab (low ub)
      2L -> "CHANGED kappa zeta",     // one rare (high ub) + common
      3L -> "alpha alpha alpha")      // single repeated common term
    for (thr <- Seq(1L, 200000L, 1000000L, 5000000L, 100000000L)) {
      val off = canon(TextAnalysis.bm25ScreenIndexed(idx, queries, thr))
      val on = canon(TextAnalysis.bm25ScreenIndexed(idx, queries, thr,
        maxScorePrune = true))
      assert(on == off, s"prune must be lossless at threshold $thr")
      val ppmOnly = canon(TextAnalysis.bm25ScreenIndexed(idx, queries,
        thr, maxDfPpm = Some(500000L)))
      val both = canon(TextAnalysis.bm25ScreenIndexed(idx, queries, thr,
        maxDfPpm = Some(500000L), maxScorePrune = true))
      assert(both == ppmOnly,
        s"prune must compose losslessly with maxDfPpm at $thr")
    }
    // and through a full ingest round: identical verdicts AND an
    // identically grown index
    val p2 = tmp(); val p3 = tmp()
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", p2)
    IndexStore.saveTextIndex(oldDocs, "doc_id", "text", p3)
    val off = canon(IndexStore.ingestText(newDocs, "doc_id", "text", p2,
      minScoreE6 = 2000000L, collapseFirst = true))
    val on = canon(IndexStore.ingestText(newDocs, "doc_id", "text", p3,
      minScoreE6 = 2000000L, collapseFirst = true, maxScorePrune = true))
    assert(on == off && off.nonEmpty)
    assert(canonIndex(p2, Seq("postings", "doclen")) ==
      canonIndex(p3, Seq("postings", "doclen")))
  }

  test("ivf tombstones: a deleted id leaves recall at load; vacuum " +
      "folds the inverted lists; the graveyard blocks re-admission") {
    val path = tmp()
    IndexStore.saveIvf(IvfIndex.build(oldVecs, "vec_id", "embedding",
      nLists = 3, trainFraction = 1.0), path)
    val queries = oldVecs.where(col("vec_id") === 1)
    def top(p: String) = IvfIndex.search(IndexStore.loadIvf(spark, p),
        oldVecs, queries, "vec_id", "embedding", k = 3, nProbe = 3)
      .collect().map(_.getLong(2)).toSet
    val before = top(path)
    // delete two of query 1's own same-cluster neighbors (cluster 1 =
    // ids 1,4,7,10) — its top-3 must visibly change
    assert(IndexStore.deleteFromIvf(spark, path,
      Seq(4L, 7L).toDF("vec_id")) == 2L)
    val after = top(path)
    assert(!after.contains(4L) && !after.contains(7L) && after != before,
      s"deleted ids must leave recall immediately: $after")
    assert(IndexStore.vacuumIvf(spark, path) == 2L)
    assert(top(path) == after, "vacuum must not change search results")
    assert(spark.read.parquet(IndexStore.tableDir(spark, path, "assign"))
      .where(col("id").isin(4L, 7L)).count() == 0L)
    // graveyard: appendIvf refuses a deleted id even after the fold
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendIvf(oldVecs.where(col("vec_id") === 4),
        "vec_id", "embedding", path)
    }
    assert(e.getMessage.contains("graveyard"), e.getMessage)
    IndexStore.appendIvf(newVecs, "vec_id", "embedding", path)
    assert(IndexStore.vacuumIvf(spark, path) == 0L)
  }
}
