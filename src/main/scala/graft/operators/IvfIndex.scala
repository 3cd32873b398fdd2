package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path for similarity search next to [[Similarity.lshTopK]]
  * (SURVEY §3.3): a coarse k-means quantizer partitions the corpus into
  * `nLists` inverted lists; a query exactly scores only the `nProbe`
  * lists whose centroids are nearest.
  *
  * 100 TB design notes:
  *  - The quantizer trains on a SAMPLE (k-means cost is per-row × k); the
  *    full corpus is then assigned in one narrow pass with the centroid
  *    matrix folded in as a literal (nLists ≤ a few thousand).
  *  - `search` is a bucket equi-join on list_id: each query touches
  *    nProbe/nLists of the corpus. Probe selection is distributed (rank
  *    over the exploded centroid list), never a driver loop.
  *  - Recall/cost dial: nProbe. nProbe = nLists degrades gracefully to
  *    exact brute force.
  *
  * Lifecycle posture (decided round 10): IVF deliberately stops at
  * persistence + append ([[IndexStore.saveIvf]]/[[IndexStore.appendIvf]]
  * — assign-to-frozen-centroids) and does NOT get an ingest-round /
  * streaming-gate twin. The canonical GROWING-corpus dedup path is the
  * sign-block vector index ([[Similarity.vectorIndex]] →
  * [[IndexStore.ingestVector]] / [[graft.streaming.StreamOps.vectorIngestBatch]]):
  * its hyperplanes are data-independent, so admission geometry never
  * drifts no matter how much the corpus grows, whereas IVF centroids are
  * a snapshot of the TRAINING distribution — under sustained ingest the
  * lists skew, recall decays, and the correct maintenance is a RETRAIN
  * on compaction cadence ([[build]] again), which an append-only gate
  * contract cannot express honestly. Use IVF for the read side (top-k
  * search over a periodically rebuilt snapshot), the sign-block index
  * for the write side (admission screening of a living corpus).
  */
object IvfIndex {

  /** Trained index: centroid matrix + corpus assignment (id, list_id). */
  final case class Model(
      centroids: Array[Array[Double]],
      assignments: DataFrame)

  /** Train the coarse quantizer and assign every corpus vector to its
    * list.
    *
    * Quantizer cost is bounded BY DEFAULT: k-means is per-row × nLists ×
    * iterations, so training on a 100 TB corpus is a non-starter. With
    * `trainFraction` unset (NaN), the builder counts the corpus (one
    * cheap aggregate over the pruned scan — build is already an action)
    * and trains on a deterministic seeded sample of ≈ `maxTrainRows`
    * rows; corpora at or under the cap train on everything, so
    * small-scale results are identical to full training. Passing an
    * explicit `trainFraction` overrides the cap.
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      seed: Long = 42L,
      trainFraction: Double = Double.NaN,
      maxTrainRows: Long = 200000L,
      kmeansMaxIter: Int = 20): Model = {
    val vecs = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val frac =
      if (!trainFraction.isNaN) trainFraction
      else {
        val total = vecs.count()
        // 1.1 headroom: Bernoulli sampling undershoots; a few extra
        // thousand training rows are cheaper than an undersized sample
        if (total <= maxTrainRows) 1.0
        else math.min(1.0, maxTrainRows * 1.1 / total)
      }
    val train = if (frac >= 1.0) vecs else vecs.sample(frac, seed)
    val km = new KMeans().setK(nLists).setSeed(seed).setMaxIter(kmeansMaxIter)
      .setFeaturesCol("features")
    val model = km.fit(train.select(array_to_vector(col("vec")).as("features")))
    val centroids = model.clusterCenters.map(_.toArray)
    Model(centroids, assign(corpus, idCol, vecCol, centroids))
  }

  /** Assign each vector to its nearest centroid: (id, list_id) in ONE
    * narrow pass (the centroid matrix folds in as a literal). Shared by
    * [[build]] and [[IndexStore.appendIvf]] — the append path assigns
    * new vectors against the FROZEN quantizer, the standard IVF
    * maintenance contract.
    */
  def assign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    df.select(col(idCol).as("id"),
      nearestList(col(vecCol).cast("array<double>"), centroids).as("list_id"))

  /** Index of the nearest centroid by squared L2, ties to the lowest
    * list id. argmin(||v-c||²) = argmin(||c||² - 2·v·c): the ||v||² term
    * is constant across centroids and dropped; ||c||² is precomputed
    * into the literal — the per-row work is exactly nLists dot products.
    */
  private[operators] def nearestList(vec: org.apache.spark.sql.Column,
      centroids: Array[Array[Double]]) = {
    val norms = centroids.map(c => c.map(x => x * x).sum)
    val dists = zip_with(
      typedlit(centroids.map(_.toSeq).toSeq), typedlit(norms.toSeq),
      (c, n2) => n2 - lit(2.0) * VectorFunctions.dotProduct(vec, c))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Top-k by cosine among the vectors of the `nProbe` nearest lists.
    * Output: (query_id, rank, neighbor_id, cos) like the other top-k ops.
    */
  def search(
      index: Model,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int): DataFrame = {
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    // distributed probe selection: explode centroid list, rank by the
    // same reduced ||c||² - 2·q·c score as nearestList
    val cLit = typedlit(index.centroids.map(_.toSeq).toSeq)
    val nLit = typedlit(index.centroids.map(c => c.map(x => x * x).sum).toSeq)
    val probes = qv
      .select(col("query_id"), col("qvec"),
        posexplode(zip_with(cLit, nLit, (c, n2) => struct(c.as("c"), n2.as("n2"))))
          .as(Seq("list_id", "cn")))
      .select(col("query_id"), col("qvec"), col("list_id"),
        (col("cn.n2") -
          lit(2.0) * VectorFunctions.dotProduct(col("qvec"), col("cn.c"))).as("d2"))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("list_id").asc)))
      .where(col("pr") <= nProbe)
      .select(col("query_id"), col("qvec"), col("list_id"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cvec"))
    val listed = index.assignments.select(col("id").as("neighbor_id"), col("list_id"))
      .join(cv, Seq("neighbor_id"))
    val scored = probes.join(listed, Seq("list_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosineSim(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }
}
