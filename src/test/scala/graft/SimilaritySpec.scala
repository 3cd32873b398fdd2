package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

/** Similarity search: brute-force top-k vs scala oracle; LSH variant
  * recall; embedding near-dup pairs (SURVEY §3.3).
  */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val dim = 16
  private val rnd = new Random(59)

  /** 3 well-separated direction clusters × 30 vectors + noise. */
  private lazy val vecs: Seq[(Long, Seq[Double])] = {
    val dirs = Seq.fill(3)(Seq.fill(dim)(rnd.nextGaussian()))
    (0 until 90).map { i =>
      val d = dirs(i % 3)
      val v = d.map(_ + 0.1 * rnd.nextGaussian())
      (i.toLong, v)
    }
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  private def bruteTopK(qid: Long, k: Int): Seq[Long] = {
    val q = vecs.find(_._1 == qid).get._2
    vecs.filter(_._1 != qid)
      .map { case (id, v) => (id, cosine(q, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k).map(_._1)
  }

  test("bruteForceTopK matches the scala oracle") {
    val got = Similarity.bruteForceTopK(df, df.where(col("vec_id") < 5),
        "vec_id", "embedding", 5)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (0L until 5L).foreach { q =>
      assert(got(q) == bruteTopK(q, 5), s"query $q")
    }
  }

  test("lshTopK: neighbors it returns are true cosine neighbors (subset + ranked)") {
    val got = Similarity.lshTopK(df, df.where(col("vec_id") < 5),
        "vec_id", "embedding", dim = dim, k = 5,
        numBlocks = 8, planesPerBlock = 4)
      .select("query_id", "rank", "neighbor_id", "cos")
      .as[(Long, Int, Long, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val qv = vecs.find(_._1 == q).get._2
      rows.foreach { case (_, _, n, c) =>
        val want = cosine(qv, vecs.find(_._1 == n).get._2)
        assert(math.abs(c - math.rint(want * 1e6) / 1e6) < 1.5e-6)
      }
      // ranks ordered by cosine desc
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.sliding(2).forall { case Array(a, b) => a >= b - 1e-12; case _ => true })
    }
  }

  test("lshTopK on a duplicated corpus: copies surface as distinct neighbors") {
    // 10 exact copies of every vector (ids offset by 1000): the collapse
    // guard must score each distinct vector once but still RETURN the
    // copies, self-excluding only the query's own id — so the top-k of
    // query 0 leads with the 9 other copies of its own vector at cos 1
    val dup = (0 until 10).map(r => vecs.map { case (id, v) => (id + r * 1000L, v) })
      .reduce(_ ++ _).toDF("vec_id", "embedding")
    val got = Similarity.lshTopK(dup, dup.where(col("vec_id") === 0),
        "vec_id", "embedding", dim = dim, k = 9,
        numBlocks = 8, planesPerBlock = 4)
      .orderBy("rank")
      .select("neighbor_id", "cos").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == (1 to 9).map(_ * 1000L), s"got ${got.toSeq}")
    assert(got.forall(_._2 == 1.0))
  }

  test("lshTopK recall vs brute force on clustered data") {
    val brute = (0L until 5L).map(q => q -> bruteTopK(q, 5).toSet).toMap
    val got = Similarity.lshTopK(df, df.where(col("vec_id") < 5),
        "vec_id", "embedding", dim = dim, k = 5,
        numBlocks = 8, planesPerBlock = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = (0L until 5L).map { q =>
      got.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / 5
    }.sum / 5
    assert(recall >= 0.8, s"recall $recall") // same-cluster neighbors collide in blocks
  }

  test("multi-probe raises recall at a fixed (small) block budget") {
    def recallAt(blocks: Int, probes: Int): Double = {
      val brute = (0L until 5L).map(q => q -> bruteTopK(q, 5).toSet).toMap
      val got = Similarity.lshTopK(df, df.where(col("vec_id") < 5),
          "vec_id", "embedding", dim = dim, k = 5,
          numBlocks = blocks, planesPerBlock = 6, multiProbe = probes)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (0L until 5L).map { q =>
        got.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / 5
      }.sum / 5
    }
    // ONE block of 6 planes: exact-bucket recall is poor; probing the 6
    // single-plane-flip buckets recovers most of it without touching
    // the corpus index
    val exact = recallAt(blocks = 1, probes = 0)
    val probed = recallAt(blocks = 1, probes = 6)
    assert(probed > exact, s"multi-probe did not help: $exact -> $probed")
    assert(probed >= 0.7, s"probed recall $probed")
  }

  test("cosineNearDupPairs finds same-cluster pairs, none below threshold") {
    val got = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        dim = dim, threshold = 0.95, numBlocks = 8, planesPerBlock = 4)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, c) =>
      assert(a < b && c >= 0.95)
      val want = cosine(vecs.find(_._1 == a).get._2, vecs.find(_._1 == b).get._2)
      assert(math.abs(c - math.rint(want * 1e6) / 1e6) < 1.5e-6)
    }
  }

  test("embeddingDecontaminate: flags only true hits; n_hits and tie rule exact") {
    // corpus: two orthogonal base directions + a third vector equal to
    // base0 (a second contamination source for eval 100)
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0))) // zero vector: cosine 0 by convention
      .toDF("vec_id", "embedding")
    // eval: 100/101 both equal base0 (tie on corpus 0 and 2 at cos 1 —
    // top_eval_id must be the SMALLER eval id); 102 matches nothing
    val evalSet = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),
      (101L, Seq(2.0, 0.0, 0.0, 0.0)),
      (102L, Seq(0.0, 0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingDecontaminate(corpus, evalSet,
        "vec_id", "embedding", threshold = 0.9)
      .orderBy("corpus_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 2L, 100L, 1.0), (2L, 2L, 100L, 1.0)),
      s"got $got")
  }

  test("deterministic hyperplanes: same seed same planes, different seed different") {
    val a = Similarity.hyperplanes(4, 8, 42L)
    val b = Similarity.hyperplanes(4, 8, 42L)
    val c = Similarity.hyperplanes(4, 8, 43L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("IvfIndex: probed search recalls brute-force neighbors on clustered data") {
    import graft.operators.IvfIndex
    val index = IvfIndex.build(df, "vec_id", "embedding", nLists = 6, seed = 42L)
    assert(index.centroids.length == 6)
    val got = IvfIndex.search(index, df, df.where(col("vec_id") < 5),
        "vec_id", "embedding", k = 5, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = (0L until 5L).map { q =>
      got.getOrElse(q, Set.empty).intersect(bruteTopK(q, 5).toSet).size.toDouble / 5
    }.sum / 5
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IvfIndex: nProbe = nLists degrades to exact brute force") {
    import graft.operators.IvfIndex
    val index = IvfIndex.build(df, "vec_id", "embedding", nLists = 4, seed = 42L)
    val got = IvfIndex.search(index, df, df.where(col("vec_id") < 3),
        "vec_id", "embedding", k = 5, nProbe = 4)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (0L until 3L).foreach { q => assert(got(q) == bruteTopK(q, 5), s"query $q") }
  }

  test("hardNegatives: same-label and self excluded, ranked by cosine") {
    import graft.operators.Similarity
    val vecs = Seq(
      (0L, 0, Array(1.0, 0.0)), (1L, 0, Array(0.99, 0.141)),
      (2L, 1, Array(0.98, 0.199)), (3L, 1, Array(0.0, 1.0)),
      (4L, 2, Array(0.7, 0.714)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.hardNegatives(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", "label", 3)
      .orderBy("rank")
      .select("rank", "neighbor_id", "neighbor_label")
      .as[(Long, Long, Int)].collect().toSeq
    // label-0 vec 1 excluded even though it is the nearest overall;
    // among labels {1,2}: vec 2 (cos~.98) > vec 4 (~.70) > vec 3 (0)
    assert(got == Seq((1L, 2L, 1), (2L, 4L, 2), (3L, 3L, 1)), s"$got")
  }

  test("semDeDup: within-cluster lower-id prune, cross-cluster miss by design") {
    // centroids far apart on axis 0; cluster members are tiny
    // perturbations (cos ~ 1 within cluster vs ~0 across)
    val c0 = Array(1.0, 0.0, 0.0)
    val c1 = Array(0.0, 1.0, 0.0)
    val rows = Seq(
      (1L, Seq(1.0, 0.001, 0.0)),   // cluster 0, kept (lowest id)
      (2L, Seq(1.0, 0.002, 0.0)),   // near-dup of 1 -> pruned
      (3L, Seq(0.9, -0.4, 0.2)),    // cluster 0 but dissimilar -> kept
      (10L, Seq(0.001, 1.0, 0.0)),  // cluster 1, kept
      (11L, Seq(0.002, 1.0, 0.0)))  // near-dup of 10 -> pruned
      .toDF("id", "v")
    val got = graft.operators.Similarity.semDeDup(rows, "id", "v",
        Array(c0, c1), threshold = 0.98)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> (0L, false), 2L -> (0L, true), 3L -> (0L, false),
      10L -> (1L, false), 11L -> (1L, true)), got.toString)
    // hub-cluster guard raises
    val hub = (1L to 20L).map(i => (i, Seq(1.0, 0.0, 0.0))).toDF("id", "v")
    val e = intercept[Exception] {
      graft.operators.Similarity.semDeDup(hub, "id", "v", Array(c0, c1),
        threshold = 0.9, maxClusterSize = 10).collect()
    }
    assert(e.getMessage.contains("quadratic"), e.getMessage)
    // empty input
    assert(graft.operators.Similarity.semDeDup(
      Seq.empty[(Long, Seq[Double])].toDF("id", "v"), "id", "v",
      Array(c0, c1), 0.9).count() == 0L)
  }

  test("prototypeEval: separable clusters land a diagonal confusion") {
    import graft.operators.Similarity
    // label 0 near (1,0), label 1 near (0,1); train = even ids
    def v(a: Double, b: Double) = Seq(a.toFloat, b.toFloat)
    val rows = Seq(
      (0L, 0, v(1.0, 0.1)), (2L, 0, v(0.9, 0.0)),
      (1L, 0, v(1.1, 0.2)),
      (4L, 1, v(0.1, 1.0)), (6L, 1, v(0.0, 0.9)),
      (3L, 1, v(0.2, 1.1)), (5L, 1, v(0.0, 1.2)))
      .toDF("vec_id", "label", "embedding")
    val train = rows.where($"vec_id" % 2 === 0)
    val test = rows.where($"vec_id" % 2 === 1)
    val got = Similarity.prototypeEval(train, test,
        "vec_id", "label", "embedding")
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((0, 0) -> 1L, (1, 1) -> 2L), got.toString)
    // deterministic under repartition (integer quantization, no float
    // reduction order anywhere)
    val g2 = Similarity.prototypeEval(train.repartition(5),
        test.repartition(3), "vec_id", "label", "embedding")
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(g2 == got)
  }
}
