package graft

import graft.operators.{KMeansQ, KPrototypes}

/** Mixed categorical+numeric Lloyd k-prototypes — degenerate-case
  * equivalences (γ=0 and numeric-only ≡ KMeansQ on the numeric part;
  * γ-dominant ≡ categorical separation), determinism, null policy.
  */
class KPrototypesSpec extends SparkSuite {
  import spark.implicits._

  // two numeric blobs at (0,0) and (10,10); categorical labels that
  // AGREE with the blobs in `catAligned` and CONFLICT in `catCross`
  private lazy val mixed = Seq(
    (1L, "r", "x", 0.0, 0.1), (2L, "r", "x", 0.1, 0.0),
    (5L, "r", "x", 0.05, 0.05),
    (3L, "b", "y", 10.0, 10.1), (4L, "b", "y", 10.1, 10.0))
    .toDF("id", "c1", "c2", "n1", "n2")

  private def clustersOf(fit: org.apache.spark.sql.DataFrame): Set[Set[Long]] =
    fit.select("id", "cluster").as[(Long, Long)].collect()
      .groupBy(_._2).map { case (_, rs) => rs.map(_._1).toSet }.toSet

  test("gamma=0 and numeric-only both degenerate to KMeansQ exactly " +
      "(same seeds, same assignment, same integer dist)") {
    val emb = mixed.select($"id",
      org.apache.spark.sql.functions.array($"n1", $"n2").as("emb"))
    val km = KMeansQ.fit(emb, "id", "emb", k = 2, maxIter = 3, seed = 7L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val gammaZero = KPrototypes.fit(mixed, "id", Seq("c1", "c2"),
        Seq("n1", "n2"), k = 2, gammaE12 = 0L, maxIter = 3, seed = 7L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gammaZero == km,
      "γ=0 must reproduce KMeansQ bit-for-bit (categoricals cost 0)")
    val numOnly = KPrototypes.fit(mixed, "id", Seq.empty,
        Seq("n1", "n2"), k = 2, gammaE12 = 999L, maxIter = 3, seed = 7L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(numOnly == km, "numeric-only must BE KMeansQ")
  }

  test("gamma-dominant clustering separates on the categoricals even " +
      "against conflicting numerics; mixed gamma balances both") {
    // categorical labels CROSS the numeric blobs: {1,3} red, {2,4,5} blue
    val crossed = Seq(
      (1L, "r", 0.0, 0.1), (2L, "b", 0.1, 0.0), (5L, "b", 0.05, 0.05),
      (3L, "r", 10.0, 10.1), (4L, "b", 10.1, 10.0))
      .toDF("id", "c1", "n1", "n2")
    // γ far above any squared numeric term (1e7² × 2 dims ≈ 2e14)
    val fit = KPrototypes.fit(crossed, "id", Seq("c1"), Seq("n1", "n2"),
      k = 2, gammaE12 = 1000000000000000L, maxIter = 4, seed = 0L)
    assert(clustersOf(fit) == Set(Set(1L, 3L), Set(2L, 4L, 5L)),
      clustersOf(fit).toString)
    // and with γ = 0 the same data separates on the numerics instead
    val fit0 = KPrototypes.fit(crossed, "id", Seq("c1"), Seq("n1", "n2"),
      k = 2, gammaE12 = 0L, maxIter = 4, seed = 0L)
    assert(clustersOf(fit0) == Set(Set(1L, 2L, 5L), Set(3L, 4L)),
      clustersOf(fit0).toString)
  }

  test("categorical-only clustering groups identical rows with dist 0; " +
      "dist is the exact mixed integer") {
    val cats = Seq(
      (1L, "a", "a", "a"), (2L, "a", "a", "a"), (3L, "a", "a", "a"),
      (10L, "b", "b", "b"), (11L, "b", "b", "b"), (12L, "b", "b", "b"))
      .toDF("id", "c1", "c2", "c3")
    // seed 0 puts one seed in each family (ids 1 and 10 rank first two
    // by md5 — deterministic, pinned)
    val fit = KPrototypes.fit(cats, "id", Seq("c1", "c2", "c3"),
      Seq.empty, k = 2, gammaE12 = 7L, maxIter = 2, seed = 0L)
    assert(clustersOf(fit) == Set(Set(1L, 2L, 3L), Set(10L, 11L, 12L)),
      clustersOf(fit).toString)
    assert(fit.select("dist").as[Long].collect().forall(_ == 0L),
      "identical members sit ON their mode — mixed dist must be 0")
  }

  test("estimator: fit ≡ object fit; transform reproduces the fit's " +
      "assignment exactly and assigns held-out rows; numeric-null rows " +
      "get a null prediction; computeCost matches the mean fit dist") {
    val rows = (1L to 40L).map(i =>
      (i, s"g${i % 3}", s"h${i % 4}", (i % 7).toDouble, 0.3 * i))
      .toDF("id", "c1", "c2", "n1", "n2")
    val est = new graft.operators.KPrototypesEstimator()
      .setK(3).setMaxIter(4).setSeed(42L).setGammaE12(500000000000L)
      .setIdCol("id").setCatCols(Seq("c1", "c2"))
      .setNumCols(Seq("n1", "n2"))
    val model = est.fit(rows)
    val direct = KPrototypes.fit(rows, "id", Seq("c1", "c2"),
        Seq("n1", "n2"), 3, 500000000000L, 4, 42L)
      .select("id", "cluster").as[(Long, Long)].collect().sortBy(_._1)
    val viaTransform = model.transform(rows)
      .select($"id", $"prediction".cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(viaTransform.toSeq == direct.toSeq,
      "transform over training rows must BE the fit assignment")
    // cost = mean of the fit's exact integer dists
    val dists = KPrototypes.fit(rows, "id", Seq("c1", "c2"),
        Seq("n1", "n2"), 3, 500000000000L, 4, 42L)
      .select("dist").as[Long].collect()
    assert(model.cost == dists.sum.toDouble / dists.length)
    assert(model.computeCost(rows) == model.cost,
      "computeCost over the training rows must equal the fit cost")
    // held-out row with a null numeric: null prediction, not a crash
    val heldOut = Seq(
      (99L, "g0", "h1", Some(3.0), Some(1.2)),
      (98L, "g1", "h2", Option.empty[Double], Some(0.5)))
      .toDF("id", "c1", "c2", "n1", "n2")
    val preds = model.transform(heldOut)
      .select("id", "prediction").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getInt(1)))).toMap
    assert(preds(99L).exists(c => c >= 0 && c < 3))
    assert(preds(98L).isEmpty, "null numeric must yield null prediction")
    // persistence round-trip: same centers, same cost, same transform
    val dir = java.nio.file.Files
      .createTempDirectory("kproto_model").toString + "/m"
    model.write.overwrite().save(dir)
    val loaded = graft.operators.KPrototypesModel.load(dir)
    assert(loaded.numCenters.map(_.toSeq).toSeq ==
      model.numCenters.map(_.toSeq).toSeq)
    assert(loaded.catCenters.map(_.toSeq).toSeq ==
      model.catCenters.map(_.toSeq).toSeq)
    assert(loaded.cost == model.cost)
    assert(loaded.transform(rows)
        .select($"id", $"prediction".cast("long"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq ==
      viaTransform.toSeq,
      "a loaded model must transform identically")
  }

  test("suggestGammaE12: exact on a known-σ column, balanced on the " +
      "q276 fixture, degenerate inputs suggest 0") {
    // two-point column {0, 2}: quantized σ²_pop = 1e12 → γ = 0.5e12
    val twoPt = Seq((1L, 0.0), (2L, 2.0)).toDF("id", "n1")
    assert(KPrototypes.suggestGammaE12(twoPt, Seq("n1"))
      == 500000000000L)
    // mean-of-variances rule: adding a CONSTANT column (σ² = 0)
    // halves the mean variance → half γ
    val withConst = twoPt.withColumn("n2",
      org.apache.spark.sql.functions.lit(5.0))
    assert(KPrototypes.suggestGammaE12(withConst, Seq("n1", "n2"))
      == 250000000000L)
    // the q276 part fixture (same scaling): the suggestion must land
    // inside the balanced window around the hand-picked γ = 1e9 —
    // within two orders of magnitude, where neither attribute kind
    // collapses (the hand-picked value sat at the aggressive end:
    // the LARGEST single squared size term)
    val part = spark.read
      .parquet("/root/testdata/sf0.001/part.parquet")
      .selectExpr("p_size / 1000.0 AS sz", "p_retailprice / 100000.0 AS pr")
    val g = KPrototypes.suggestGammaE12(part, Seq("sz", "pr"))
    assert(g >= 10000000L && g <= 100000000000L,
      s"q276-fixture suggestion $g outside the balanced window of 1e9")
    // degenerate: empty input and all-null columns suggest 0 (γ = 0 is
    // the documented numeric-only degeneration, not an error)
    assert(KPrototypes.suggestGammaE12(twoPt.limit(0), Seq("n1")) == 0L)
    assert(KPrototypes.suggestGammaE12(
      Seq((1L, Option.empty[Double])).toDF("id", "n1"), Seq("n1")) == 0L)
  }

  test("cost is non-increasing over Lloyd iterations (the property " +
      "updates must preserve: mode minimizes Hamming, floor-mean " +
      "tracks the squared-L2 argmin)") {
    val rows = (1L to 60L).map(i =>
      (i, s"g${i % 4}", ((i % 9) / 10.0), (i % 11) / 10.0))
      .toDF("id", "c1", "n1", "n2")
    val costs = (1 to 5).map { mi =>
      KPrototypes.fit(rows, "id", Seq("c1"), Seq("n1", "n2"),
          k = 3, gammaE12 = 100000000000L, maxIter = mi, seed = 42L)
        .agg(org.apache.spark.sql.functions.sum($"dist")).head.getLong(0)
    }
    assert(costs.zip(costs.tail).forall { case (a, b) => b <= a },
      s"cost must be non-increasing across iterations: $costs")
  }

  test("deterministic under repartition; nulls: categorical null is a " +
      "category, numeric null drops the row; guards raise") {
    val rows = (1L to 40L).map(i =>
      (i, s"g${i % 3}", if (i % 5 == 0) None else Some(s"h${i % 4}"),
        (i % 7).toDouble, 0.3 * i))
      .toDF("id", "c1", "c2", "n1", "n2")
    val a = KPrototypes.fit(rows, "id", Seq("c1", "c2"), Seq("n1", "n2"),
        k = 3, gammaE12 = 500000000000L, maxIter = 4, seed = 42L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = KPrototypes.fit(rows.repartition(7), "id", Seq("c1", "c2"),
        Seq("n1", "n2"), k = 3, gammaE12 = 500000000000L, maxIter = 4,
        seed = 42L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "partitioning changed the k-prototypes fit")
    assert(a.map(_._1) == (1L to 40L), "null c2 rows must stay (own category)")
    // the large-k fallback plan (two-level min_by) must be EQUAL to the
    // default conditional-sum plan — force it through the seam
    val prevMaxK = KPrototypes.condSumMaxK
    KPrototypes.condSumMaxK = 0
    try {
      val fb = KPrototypes.fit(rows, "id", Seq("c1", "c2"), Seq("n1", "n2"),
          k = 3, gammaE12 = 500000000000L, maxIter = 4, seed = 42L)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(fb == a, "fallback assignment plan diverged from default")
    } finally KPrototypes.condSumMaxK = prevMaxK
    // numeric null drops the row up front
    val withNullNum = rows.unionByName(
      Seq((99L, "g0", Some("h0"), Option.empty[Double], Some(1.0)))
        .toDF("id", "c1", "c2", "n1", "n2"))
    val c = KPrototypes.fit(withNullNum, "id", Seq("c1", "c2"),
        Seq("n1", "n2"), k = 3, gammaE12 = 500000000000L, maxIter = 4,
        seed = 42L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(c.map(_._1) == (1L to 40L), "null-numeric row must drop")
    intercept[IllegalArgumentException] {
      KPrototypes.fit(rows, "id", Seq.empty, Seq.empty, 2, 1L, 3, 1L)
    }
    intercept[IllegalArgumentException] {
      KPrototypes.fit(rows, "id", Seq("c1"), Seq("n1"), 1, 1L, 3, 1L)
    }
    intercept[IllegalArgumentException] {
      KPrototypes.fit(rows, "id", Seq("c1"), Seq("n1"), 2, -1L, 3, 1L)
    }
    // fewer distinct ids than k RAISES: the conditional-sum assignment
    // would otherwise manufacture phantom zero-distance clusters for
    // the unseeded cids (review finding, round 15)
    val tiny = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "c1", "n1")
    val eFew = intercept[IllegalArgumentException] {
      KPrototypes.fit(tiny, "id", Seq("c1"), Seq("n1"), 8, 1L, 2, 1L)
    }
    assert(eFew.getMessage.contains("distinct"), eFew.getMessage)
  }
}
