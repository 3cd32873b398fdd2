package graft

import graft.operators.{KModes, LocalKModes}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Distributed K-modes fit/transform (SURVEY §6 tier 2: fixed-point,
  * determinism, ensemble preconditions).
  */
class KModesSpec extends SparkSuite {
  import spark.implicits._

  private def plantedDf(n: Int, f: Int, groups: Int, seed: Int) = {
    val rnd = new Random(seed)
    val rows = Seq.tabulate(n) { i =>
      val g = i % groups
      Seq.tabulate(f) { j =>
        if (rnd.nextDouble() < 0.9) s"g${g}v$j" else s"n${rnd.nextInt(3)}"
      }
    }
    rows.toDF("features")
  }

  test("global fit: recovers planted groups, deterministic across runs") {
    val df = plantedDf(600, 5, 3, 31)
    val m1 = new KModes().setK(3).setMaxIter(15).setSeed(7L).fit(df)
    val m2 = new KModes().setK(3).setMaxIter(15).setSeed(7L).fit(df)
    assert(m1.clusterCenters.map(_.toSeq).toSeq == m2.clusterCenters.map(_.toSeq).toSeq)
    assert(m1.clusterCenters.length == 3)

    val pred = m1.transform(df)
    val purity = pred.groupBy("prediction")
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(purity.sum == 600)
    assert(m1.cost < 2.0, s"cost ${m1.cost}") // well-separated: low mean distance
  }

  test("fixed point: fitted centers are per-column modes of their clusters") {
    val df = plantedDf(300, 4, 3, 37)
    val model = new KModes().setK(3).setMaxIter(20).setSeed(7L).fit(df)
    val assigned = model.transform(df).select("prediction", "features")
      .as[(Int, Seq[String])].collect()
    assigned.groupBy(_._1).foreach { case (c, rows) =>
      (0 until 4).foreach { j =>
        val freq = rows.map(_._2(j)).groupBy(identity).map { case (v, vs) => v -> vs.size }
        val mode = freq.minBy { case (v, cnt) => (-cnt, v) }._1
        assert(model.clusterCenters(c)(j) == mode)
      }
    }
  }

  test("model cost equals computeCost on training data (final centers)") {
    val df = plantedDf(200, 4, 2, 41)
    // maxIter=1 exits un-converged — cost must still match final centers
    val model = new KModes().setK(2).setMaxIter(1).setSeed(7L).fit(df)
    assert(math.abs(model.cost - model.computeCost(df)) < 1e-9)
  }

  test("null features become their own category") {
    val df = Seq(Seq[String]("a", null), Seq("a", null), Seq("b", "x"), Seq("b", "x"))
      .toDF("features")
    val model = new KModes().setK(2).setMaxIter(5).setSeed(7L).fit(df)
    assert(model.cost == 0.0) // two pure clusters incl. the null-category one
  }

  test("ensemble fit: matches reference partition semantics, validates size") {
    val df = plantedDf(400, 4, 2, 43).repartition(4, col("features"))
    val model = new KModes().setK(2).setMaxIter(10).setSeed(7L)
      .setInitMode("ensemble").fit(df)
    assert(model.clusterCenters.length == 2)
    assert(model.cost >= 0.0)

    val tiny = plantedDf(6, 4, 2, 47).repartition(4)
    val err = intercept[IllegalArgumentException] {
      new KModes().setK(5).setMaxIter(5).setSeed(7L).setInitMode("ensemble").fit(tiny)
    }
    assert(err.getMessage.contains("partition"))
  }

  test("ensemble golden snapshot: fixed seed + partitioning pin stage-1/2 output") {
    // SURVEY §8.2 M2: an end-to-end golden value for the ensemble path.
    // Any drift in stage-1 local Lloyd, stage-2 meta-clustering, seeding,
    // or tie-breaking changes these exact centers and fails here.
    // repartition(4, col) hash-partitions deterministically, so the
    // layout-dependence the reference shares is pinned too.
    val rnd = new Random(53)
    val rows = Seq.tabulate(240) { i =>
      val g = i % 3
      Seq.tabulate(4) { j =>
        if (rnd.nextDouble() < 0.85) s"g${g}v$j" else s"n${rnd.nextInt(4)}"
      }
    }
    val df = rows.toDF("features").repartition(4, col("features"))
    val model = new KModes().setK(3).setMaxIter(10).setSeed(7L)
      .setInitMode("ensemble").fit(df)
    val golden = Seq(
      Seq("g2v0", "g2v1", "g2v2", "g2v3"),
      Seq("g0v0", "g0v1", "g0v2", "g0v3"),
      Seq("g1v0", "g1v1", "g1v2", "g1v3"))
    assert(model.clusterCenters.map(_.toSeq).toSeq == golden)
    assert(math.abs(model.cost - 0.5875) < 1e-12, s"cost drifted: ${model.cost}")
    assert(model.iterations == 2)
  }

  test("ensemble stage-2 equals LocalKModes.metaCluster on collected modes") {
    // consistency of the driver-side path with its unit-tested core
    val modes = Array(
      Array("a", "x"), Array("a", "y"), Array("b", "x"), Array("b", "y"),
      Array("a", "x"), Array("b", "x"))
    val r = LocalKModes.metaCluster(modes, 2, 10, 42L)
    assert(r.centers.length == 2)
    assert(r.centers.map(_.toSeq).distinct.length == 2)
  }

  test("scalar predict agrees with distributed transform row by row") {
    val df = plantedDf(300, 4, 3, 67)
    val model = new KModes().setK(3).setMaxIter(10).setSeed(7L).fit(df)
    val rows = model.transform(df)
      .select("features", "prediction").as[(Seq[String], Int)].collect()
    rows.foreach { case (f, p) =>
      assert(model.predict(f) == p, s"scalar/distributed disagree on $f")
    }
    assert(model.clusters.map(_.toSeq).toSeq ==
      model.clusterCenters.map(_.toSeq).toSeq)
  }

  test("frequency assignment step matches LocalKModes.frequencyDissim") {
    val df = plantedDf(400, 4, 3, 43)
    val centers = Array(
      Array("g0v0", "g0v1", "g0v2", "g0v3"),
      Array("g1v0", "g1v1", "g1v2", "g1v3"),
      Array("g2v0", "g2v1", "g2v2", "g2v3"))
    val out = graft.operators.FrequencyAssign.assign(df, "features", centers)
      .select(col("features"), col("prediction"), col("min_dist"))
      .collect()

    // driver-side reference: Hamming populations, then frequencyDissim
    // per candidate cluster with that cluster's tables (empty → Hamming)
    val rows = df.collect().map(_.getSeq[String](0).toArray)
    val hAssign = rows.map { r =>
      centers.indices.minBy(c => (LocalKModes.hamming(r, centers(c)), c))
    }
    val sizes = Array.tabulate(centers.length)(c => hAssign.count(_ == c).toLong)
    val freqs = Array.tabulate(centers.length) { c =>
      Array.tabulate(4) { i =>
        rows.zip(hAssign).filter(_._2 == c).groupBy(_._1(i))
          .map { case (v, g) => v -> g.length.toLong }: collection.Map[String, Long]
      }
    }
    def refDist(r: Array[String], c: Int): Double =
      if (sizes(c) == 0) LocalKModes.hamming(r, centers(c)).toDouble
      else LocalKModes.frequencyDissim(r, centers(c), freqs(c), sizes(c))
    out.foreach { row =>
      val f = row.getSeq[String](0).toArray
      val ds = centers.indices.map(refDist(f, _))
      val expP = centers.indices.minBy(c => (ds(c), c))
      assert(row.getInt(1) == expP, s"row ${f.toSeq}")
      assert(math.abs(row.getDouble(2) - ds.min) < 1e-9)
    }
  }

  test("portable md5 init: deterministic fit, k centers, valid fixed point") {
    val df = plantedDf(300, 4, 3, 53)
    val m1 = new KModes().setK(3).setMaxIter(15).setSeed(7L).setInitHash("md5").fit(df)
    val m2 = new KModes().setK(3).setMaxIter(15).setSeed(7L).setInitHash("md5").fit(df)
    assert(m1.clusterCenters.map(_.toSeq).toSeq == m2.clusterCenters.map(_.toSeq).toSeq)
    assert(m1.clusterCenters.length == 3)
    // same quality contract as the default hash: low cost on planted data
    assert(m1.cost < 2.0, s"cost ${m1.cost}")
  }

  test("model save/load roundtrip preserves centers, cost, and transform") {
    val df = plantedDf(200, 4, 2, 61)
    val model = new KModes().setK(2).setMaxIter(10).setSeed(7L).fit(df)
    val dir = java.nio.file.Files.createTempDirectory("kmodes_model").toString
    model.write.overwrite().save(dir)
    val loaded = graft.operators.KModesModel.load(dir)
    assert(loaded.clusterCenters.map(_.toSeq).toSeq ==
      model.clusterCenters.map(_.toSeq).toSeq)
    assert(loaded.cost == model.cost)
    assert(loaded.iterations == model.iterations)
    val a = model.transform(df).select("prediction").as[Int].collect().toSeq
    val b = loaded.transform(df).select("prediction").as[Int].collect().toSeq
    assert(a == b)
  }
}
