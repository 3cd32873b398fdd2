package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input robustness: every pipeline operator must return an
  * EMPTY (not crashed, not null-poisoned) result on an empty input —
  * at 100 TB a partition-pruned read routinely produces zero rows and
  * an operator that throws on it kills the whole job.
  */
class EmptyInputSpec extends SparkSuite {
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private def emptyVecs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType)))))

  test("round-15 family: empty query relations stay empty; empty " +
      "corpus stays empty; KPrototypes raises its k-guard, never " +
      "phantom clusters") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val idx = TextAnalysis.textIndex(docs, "doc_id", "text")
    val emptyQ = emptyDocs.selectExpr("doc_id AS qid", "text AS qtext")
    // default = AUTO: the eager pre-flight statistic must decide
    // cleanly (no prune — nothing matched) on an empty query relation
    assert(TextAnalysis.bm25TopKJoin(idx, emptyQ, "qid", "qtext", 5)
      .count() == 0)
    assert(TextAnalysis.bm25TopKJoin(idx, emptyQ, "qid", "qtext", 5,
      maxScorePrune = Some(true)).count() == 0)
    assert(TextAnalysis.bm25ScreenJoin(idx, emptyQ, "qid", "qtext",
      minScoreE6 = 1L, maxScorePrune = Some(true)).count() == 0)
    assert(TextAnalysis.bm25ScreenJoin(idx, emptyQ, "qid", "qtext",
      minScoreE6 = 1L).count() == 0)
    // empty CORPUS, live queries: no matches, no crash (pruned + auto)
    val emptyIdx = TextAnalysis.textIndex(emptyDocs, "doc_id", "text")
    val liveQ = Seq((1L, "alpha")).toDF("qid", "qtext")
    assert(TextAnalysis.bm25TopKJoin(emptyIdx, liveQ, "qid", "qtext", 5,
      maxScorePrune = Some(true)).count() == 0)
    assert(TextAnalysis.bm25TopKJoin(emptyIdx, liveQ, "qid", "qtext", 5)
      .count() == 0)
    // KPrototypes on an empty relation: the distinct-ids-vs-k guard
    // raises with its own message (an empty fit has no honest answer)
    val e = intercept[IllegalArgumentException] {
      KPrototypes.fit(
        emptyDocs.selectExpr("doc_id AS id", "text AS c1",
          "CAST(doc_id AS DOUBLE) AS n1"),
        "id", Seq("c1"), Seq("n1"), k = 2, gammaE12 = 1L,
        maxIter = 2, seed = 1L)
    }
    assert(e.getMessage.contains("distinct"), e.getMessage)
  }

  test("dedup family returns empty on empty input") {
    assert(Dedup.minhashLSH(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.exact(emptyDocs, Seq(col("text")), col("doc_id")).count() == 0)
    assert(Dedup.deduplicate(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("minhashLSHJoin returns empty when either side is empty") {
    import spark.implicits._
    val docs = Seq((1L, "some corpus text here")).toDF("doc_id", "text")
    assert(Dedup.minhashLSHJoin(emptyDocs, docs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashLSHJoin(docs, emptyDocs, "doc_id", "text").count() == 0)
  }

  test("connectedComponents of an empty pair list is empty") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(pairs).count() == 0)
  }

  test("similarity family returns empty on empty corpus or queries") {
    assert(Similarity.bruteForceTopK(emptyVecs, emptyVecs, "vec_id", "embedding", 5)
      .count() == 0)
    assert(Similarity.lshTopK(emptyVecs, emptyVecs, "vec_id", "embedding",
      dim = 4, k = 5).count() == 0)
    assert(Similarity.cosineNearDupPairs(emptyVecs, "vec_id", "embedding",
      dim = 4, threshold = 0.5).count() == 0)
  }

  test("sessionize and tfidf return empty on empty input") {
    val ev = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("user_id", LongType), StructField("ts", LongType),
        StructField("event_id", LongType), StructField("value", DoubleType))))
    assert(Sessionize.sessions(ev, "user_id", "ts", "event_id", "value", 100L)
      .count() == 0)
    assert(TextAnalysis.topTerms(emptyDocs, "doc_id", "text", 5).count() == 0)
    assert(TextAnalysis.bm25TopK(emptyDocs, "doc_id", "text",
      Seq(1L -> "apple"), 5).count() == 0)
  }

  test("null-text documents never pair, with or without non-null peers") {
    val docs = Seq((1L, null: String), (2L, null: String), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashLSH(docs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(docs, "doc_id", "text").count() == 0)
  }

  test("sketch family returns empty state on empty input; probes still answer") {
    val emptyKeys = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", StringType))))
    assert(Sketches.hllState(emptyKeys, "k").count() == 0)
    val sk = Sketches.cmSketch(emptyKeys, "k")
    assert(sk.cells.count() == 0)
    // probing an EMPTY sketch must answer 0 (unseen), not crash
    val probed = Sketches.cmLookup(sk, Seq("x").toDF("k"), "k")
      .select("cm_est").as[Long].collect()
    assert(probed.toSeq == Seq(0L))
    val bloom = Sketches.bloomBits(emptyKeys, "k")
    assert(bloom.bits.count() == 0)
    val maybe = Sketches.bloomProbe(bloom, Seq("x").toDF("k"), "k")
      .select("maybe_member").as[Boolean].collect()
    assert(maybe.toSeq == Seq(false), "empty bloom must reject every probe")
  }

  test("corpus-shaping ops return empty on empty/degenerate input") {
    assert(CorpusPrep.chunk(emptyDocs, "doc_id", "text").count() == 0)
    assert(CorpusPrep.clean(emptyDocs, "doc_id", "text").count() == 0)
    val docs = Seq((1L, "real corpus text with several tokens present")).toDF("doc_id", "text")
    assert(Dedup.ngramContamination(emptyDocs, docs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramContamination(docs, emptyDocs, "doc_id", "text").count() == 0)
    assert(Sampling.weightedHashSample(emptyDocs, "doc_id", lit(0.5)).count() == 0)
  }

  test("round-4 operator family returns empty on empty input") {
    val emptyIv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("id", LongType),
        StructField("s", LongType), StructField("e", LongType))))
    val iv = Seq((1L, 1L, 0L, 10L)).toDF("k", "id", "s", "e")
    assert(IntervalJoin.selfOverlapPairs(emptyIv, "k", "id", "s", "e", 64).count() == 0)
    assert(IntervalJoin.overlapJoin(emptyIv, iv, "k", "id", "s", "e", 64).count() == 0)
    assert(IntervalJoin.overlapJoin(iv, emptyIv, "k", "id", "s", "e", 64).count() == 0)
    val emptyVals = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("g", StringType), StructField("v", DoubleType))))
    assert(Stats.outliers(emptyVals, Seq("g"), "v").count() == 0)
    assert(Stats.robustOutliers(emptyVals, Seq("g"), "v").count() == 0)
    val emptyTs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("t", LongType),
        StructField("id", LongType))))
    val ts = Seq((1L, 5L, 9L)).toDF("k", "t", "id")
    assert(AsOfJoin.latestAsOf(emptyTs, ts, "k", "t", "id").count() == 0)
    // empty RIGHT side: left rows survive with a null match, not dropped
    val lone = AsOfJoin.nextAsOf(ts, emptyTs, "k", "t", "id").collect()
    assert(lone.length == 1 && lone.head.isNullAt(1))
    assert(Sampling.leakProofSplit(emptyDocs, "doc_id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10)).count() == 0)
    val topk = iv.limit(0).groupBy("k")
      .agg(TopKAgg.topK(col("s"), col("id"), 3).as("top"))
    assert(topk.count() == 0)
  }

  test("round-5 operator family: empty inputs stay empty, not crashed") {
    // nearest as-of: empty left = empty; empty right = null matches
    val emptyTs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("t", LongType),
        StructField("id", LongType))))
    val ts = Seq((1L, 5L, 9L)).toDF("k", "t", "id")
    assert(AsOfJoin.nearestAsOf(emptyTs, ts, "k", "t", "id").count() == 0)
    val lone = AsOfJoin.nearestAsOf(ts, emptyTs, "k", "t", "id").collect()
    assert(lone.length == 1 && lone.head.isNullAt(1))
    // persisted index over an EMPTY corpus: loads, probes to zero rows,
    // and accepts a first append (the bootstrap-from-nothing path)
    val path = java.nio.file.Files.createTempDirectory("graft_empty_idx").toString
    IndexStore.saveCorpusIndex(emptyDocs, "doc_id", "text", path)
    val probe = Seq((1L, "some probe text here")).toDF("doc_id", "text")
    assert(Dedup.minhashLSHJoinIndexed(probe,
      IndexStore.loadCorpusIndex(spark, path), "doc_id", "text").count() == 0)
    IndexStore.appendCorpusIndex(probe, "doc_id", "text", path)
    assert(spark.read.parquet(s"$path/members").count() == 1)
    // BPE over an empty frame / null text
    val bpe = new graft.functions.Bpe(IndexedSeq(("a", "b")))
    assert(emptyDocs.select(
      graft.functions.Bpe.countUdf(bpe)(col("text"))).count() == 0)
    assert(CorpusPrep.chunk(emptyDocs, "doc_id", "text",
      tokensOf = graft.functions.Bpe.bpeTokens(bpe)).count() == 0)
  }

  test("mixture/exact-k/packing/embedding-decon: empty inputs stay empty") {
    val emptyLang = emptyDocs.withColumn("lang", col("text"))
    assert(Sampling.temperatureSample(emptyLang, "lang", "doc_id", 0.5)
      .count() == 0)
    assert(Sampling.exactKSample(emptyLang, "lang", "doc_id", 5).count() == 0)
    val emptyTok = emptyLang.withColumn("n", lit(null).cast("long"))
    assert(CorpusPrep.packSequences(emptyTok, "lang", "doc_id", "n", 64L)
      .count() == 0)
    // degenerate: every doc empty → no stream, no examples
    val zeros = Seq((1L, "en", 0L), (2L, "en", 0L)).toDF("doc_id", "lang", "n")
    assert(CorpusPrep.packSequences(zeros, "lang", "doc_id", "n", 64L)
      .count() == 0)
    val vec = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    assert(Similarity.embeddingDecontaminate(emptyVecs, vec,
      "vec_id", "embedding", 0.9).count() == 0)
    assert(Similarity.embeddingDecontaminate(vec, emptyVecs,
      "vec_id", "embedding", 0.9).count() == 0)
  }

  test("round-5c family: empty inputs stay empty (or zero-row reports)") {
    val emptyBasket = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("b", LongType), StructField("i", LongType))))
    assert(Basket.pairRules(emptyBasket, "b", "i", minSupport = 1).count() == 0)
    val emptySeries = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", StringType), StructField("t", LongType),
        StructField("x", LongType))))
    assert(Stats.cusumShift(emptySeries, "k", "t", "x", 1, 10).count() == 0)
    val emptyEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))
    // sources with no edges: levels table is just the seeds
    assert(graft.operators.Graph.bfsLevels(emptyEdges, Seq(1L), 4)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 0L)))
    val emptyV = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("v", DoubleType))))
    // PSI of two empty snapshots: every bin smoothed equal -> 0 drift
    val psi = Stats.psi(emptyV, emptyV, "v", 100L, 4).collect()
    assert(psi.length == 5 && psi.forall(_.getAs[Long]("psi_total_e6") == 0L))
    // drift profile of two empty frames: no profile rows on either side
    assert(Profile.drift(emptyDocs, emptyDocs, Seq("doc_id")).count() == 0)
    // HLL overlap needs >= 2 groups; an empty state has none
    assert(Sketches.hllOverlap(
      Sketches.hllState(emptyDocs, "doc_id", Seq("text")), "text").count() == 0)
  }

  test("round-5d family: empty inputs yield empty or zeroed reports") {
    val emptyKV = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("v", LongType))))
    assert(FuzzyJoin.selfPairs(
      emptyDocs.select(col("doc_id"), col("text").as("s")), "doc_id", "s")
      .count() == 0)
    // rollup: single zeroed (others) row is the defined empty report
    val ro = Rollup.topNOthers(emptyKV, "k", "v", 3).collect()
    assert(ro.length == 1 && ro.head.getAs[Long]("value_sum") == 0L)
    assert(Stats.imputeMedian(
      emptyKV.withColumn("id", col("k")), Seq("k"), "id", "v").count() == 0)
    assert(Encoding.labelDictionary(emptyKV, "v").count() == 0)
    val assoc = Profile.association(
      emptyKV.withColumn("a", col("k")).withColumn("b", col("v")),
      "a", "b").head
    assert(assoc.getAs[Long]("n") == 0 && assoc.getAs[Long]("dof") == 0)
    val series = emptyKV.withColumn("t", col("k")).withColumn("x", col("v"))
    assert(Stats.rollingOutliers(series, "k", "t", "x", 10, 25).count() == 0)
    val emptyEv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("u", LongType), StructField("ts", LongType),
        StructField("et", StringType))))
    assert(Behavior.conversionLatency(emptyEv, "u", "ts",
      col("et") === "a", col("et") === "b").count() == 0)
    val conc = Profile.concentration(emptyKV, "k", "v").head
    assert(conc.getAs[Long]("n_keys") == 0 &&
      conc.isNullAt(conc.fieldIndex("gini_ppm")))
    assert(Sketches.hllRolling(
      Sketches.hllState(emptyKV, "v", Seq("k")), Nil, "k", 7).count() == 0)
    assert(Profile.joinCardinality(emptyKV, emptyKV, "k", "k", 5).count() == 0)
  }

  test("round-5e family (q134-q143): empty inputs stay empty or zeroed") {
    import org.apache.spark.sql.types._
    val emptyKV = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", StringType), StructField("v", DoubleType),
        StructField("id", LongType))))
    assert(Encoding.targetEncodeLoo(emptyKV, "k", "v").count() == 0)
    val emptyEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))
    assert(Graph.kCore(emptyEdges, k = 2, rounds = 3).count() == 0)
    assert(Sampling.walkForwardFolds(
      emptyKV.withColumn("ts", col("id")), "ts", 2, 10, 5, 5).count() == 0)
    assert(Stats.rankNormalize(emptyKV, Seq("k"), "v").count() == 0)
    assert(Stats.winsorize(emptyKV, Seq("k"), "v").count() == 0)
    // pair report over an empty measure table: rows survive, stats null
    val z = Stats.twoSampleZ(emptyKV, "k", "v", Seq("a" -> "b")).head
    assert(z.getAs[Long]("n_a") == 0 && z.isNullAt(z.fieldIndex("z")))
    val emptyDocs2 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    assert(TextAnalysis.pmiPairs(emptyDocs2, "doc_id", "text").count() == 0)
    // bloom of an empty dim prunes EVERYTHING (no bits set)
    val fact = Seq((1L, "x")).toDF("k2", "p")
    assert(Sketches.bloomPrune(
      Sketches.bloomBits(emptyKV.select(col("id")), "id"),
      fact, "k2").count() == 0)
    assert(FuzzyJoin.goldenRecords(
      emptyKV.withColumn("s", col("v")), "id", "k", "s").count() == 0)
  }

  test("round-5f family (q144-q151): empty inputs stay empty or zeroed") {
    import org.apache.spark.sql.types._
    val emptyFacts = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("fid", LongType), StructField("k", LongType),
        StructField("ts", LongType))))
    val emptyDim = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("tier", StringType),
        StructField("valid_from", LongType), StructField("valid_to", LongType))))
    // empty dim: every fact survives with null attrs
    val pit = ChangeCapture.pointInTime(
      Seq((1L, 2L, 3L)).toDF("fid", "k", "ts"), emptyDim, "k", "ts",
      Seq("tier")).collect()
    assert(pit.length == 1 && pit.head.isNullAt(3))
    assert(ChangeCapture.pointInTime(emptyFacts, emptyDim, "k", "ts",
      Seq("tier")).count() == 0)
    // empty change log: snapshot passes through untouched
    val snap = Seq((1L, "a")).toDF("id", "v")
    val emptyChanges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("ts", LongType),
        StructField("tie", LongType), StructField("op", StringType),
        StructField("v", StringType))))
    assert(ChangeCapture.applyCdc(snap, emptyChanges, "id", "ts", "tie",
      "op", Seq("v")).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    val emptyPos = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType), StructField("p", LongType))))
    assert(Sampling.negativeSamples(emptyPos, Seq(1L, 2L).toDF("item"),
      "a", "p", "item", k = 3).count() == 0)
    // empty POOL: draws find nothing, anchors yield zero rows
    assert(Sampling.negativeSamples(Seq((1L, 2L)).toDF("a", "p"),
      emptyPos.select(col("a").as("item")), "a", "p", "item", k = 3)
      .count() == 0)
    val emptyVecsL = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("label", IntegerType),
        StructField("embedding", ArrayType(DoubleType)))))
    assert(Similarity.hardNegatives(emptyVecsL, emptyVecsL, "vec_id",
      "embedding", "label", 3).count() == 0)
    val emptyPts = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("x", LongType),
        StructField("y", LongType))))
    assert(SpatialJoin.radiusSelfPairs(emptyPts, "id", "x", "y", 10L)
      .count() == 0)
    val emptyEv2 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("u", LongType), StructField("ts", LongType),
        StructField("id", LongType), StructField("et", StringType))))
    assert(Behavior.markovAttribution(emptyEv2, "u", "ts", "id", "et",
      "conv").count() == 0)
  }

  test("round-6 family returns empty on empty input") {
    import org.apache.spark.sql.types._
    // quantile sketch: empty build → empty state, empty readout; empty
    // merges stay empty
    val emptyKV = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("g", StringType),
        StructField("v", LongType), StructField("k", LongType))))
    val st = Sketches.quantState(emptyKV, "v", "k", Seq("g"))
    assert(st.items.count() == 0 && st.meta.count() == 0)
    assert(Sketches.quantQuantiles(st, Seq(500000L)).count() == 0)
    assert(st.merge(st).items.count() == 0)
    assert(Sketches.quantRolling(emptyKV.withColumn("day", lit(0L)),
      "v", "k", Seq("g"), "day", 7, Seq(500000L)).count() == 0)
    // graph: empty edge lists → empty assignments/levels, no budget raise
    val emptyEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("src", LongType),
        StructField("dst", LongType))))
    assert(Graph.stronglyConnectedComponents(emptyEdges).count() == 0)
    assert(Graph.dagLevels(emptyEdges).count() == 0)
    // video: empty asset set and a null-media asset both yield no rows
    val emptyAssets = spark.emptyDataset(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaAsset])
    assert(Multimodal.videoFrameStats(emptyAssets).count() == 0)
    assert(Multimodal.sampleVideoFrames(emptyAssets).count() == 0)
    val nullMedia = Seq(Multimodal.MediaAsset(1L, "video", null)).toDS()
    assert(Multimodal.videoFrameStats(nullMedia).count() == 0)
  }

  test("round-11 maintenance ops on empty/degenerate indexes: compact, " +
      "repair, describe, check, reap all no-op cleanly") {
    val path = java.nio.file.Files.createTempDirectory("graft_empty_idx").toString
    IndexStore.saveCorpusIndex(emptyDocs, "doc_id", "text", path)
    // fsck of an empty index: no findings, nothing to raise
    assert(IndexStore.checkIndex(spark, path).isEmpty)
    // compaction of empty tables: one file target, zero bytes, no crash
    // (an "empty" parquet table still holds a schema-bearing footer
    // file, so file/byte counts are ≤1/small, not zero)
    val stats = IndexStore.compactIndex(spark, path)
    assert(stats.forall(_.filesAfter <= 1L), s"$stats")
    // describe resolves the new generation
    val d = IndexStore.describeIndex(spark, path)
    assert(d.forall(s => s.generation == 1L && s.files <= 1L), s"$d")
    // reap retires the empty gen-0 dirs; the empty index still loads
    IndexStore.reapIndexGenerations(spark, path): Unit
    assert(Dedup.minhashLSHJoinIndexed(
      Seq((1L, "probe text")).toDF("doc_id", "text"),
      IndexStore.loadCorpusIndex(spark, path), "doc_id", "text").count() == 0)
    // text index: repair of a healthy (and empty) index prunes nothing
    val tPath = java.nio.file.Files.createTempDirectory("graft_empty_txt").toString
    IndexStore.saveTextIndex(emptyDocs, "doc_id", "text", tPath)
    assert(IndexStore.repairTextIndex(spark, tPath) == 0L)
    assert(IndexStore.checkIndex(spark, tPath).isEmpty)
    IndexStore.loadTextIndex(spark, tPath): Unit
    // an all-duplicate (empty-admission) ingest round after a compact
    // appends nothing and leaves the generation untouched
    val mPath = java.nio.file.Files.createTempDirectory("graft_empty_med").toString
    IndexStore.saveMediaIndex(Seq((10L, 0x1234L)).toDF("id", "dh"),
      "id", "dh", mPath)
    IndexStore.compactIndex(spark, mPath): Unit
    val v = IndexStore.ingestMedia(Seq((20L, 0x1234L)).toDF("id", "dh"),
      "id", "dh", mPath)
    assert(v.where(col("status") === "admitted").count() == 0)
    assert(IndexStore.describeIndex(spark, mPath)
      .forall(_.generation == 1L))
    // ingestText degenerate batches: an EMPTY batch (and one that is
    // all null/token-less text — dropped up front) yields no verdicts
    // and leaves the index untouched; an all-duplicate batch appends
    // nothing
    val xPath = java.nio.file.Files.createTempDirectory("graft_empty_tin").toString
    IndexStore.saveTextIndex(
      Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", xPath)
    assert(IndexStore.ingestText(emptyDocs, "doc_id", "text", xPath,
      1000000L).count() == 0)
    assert(IndexStore.ingestText(
      Seq[(java.lang.Long, String)]((20L, null), (21L, "   "))
        .toDF("doc_id", "text"),
      "doc_id", "text", xPath, 1000000L).count() == 0)
    val tv = IndexStore.ingestText(
      Seq((30L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", xPath, 1000000L)
    assert(tv.where(col("status") === "admitted").count() == 0)
    assert(spark.read.parquet(IndexStore.tableDir(spark, xPath, "doclen"))
      .count() == 1, "all-duplicate round must not grow the index")
  }
}
