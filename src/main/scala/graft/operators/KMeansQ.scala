package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-MEANS on e6-QUANTIZED integer embeddings — the
  * numeric sibling of [[KModes]] (SURVEY §3.1's algorithm family,
  * continuous domain), engineered for the repo's exactness contract:
  * floats make both the assignment argmin and the centroid mean
  * reduction-order-dependent, so vectors are projected to integers
  * (floor(x·1e6), the [[Similarity.prototypeEval]] rule) and every
  * step — seeded init, squared-L2 assignment, floor-mean update — is
  * integer arithmetic an external engine replays digit-for-digit.
  *
  * Algorithm (all rules total-ordered):
  *  - init: the k vectors with the smallest `md5(seed ␁ id)` (ties →
  *    id ASC) become centroids 0..k−1 — the [[KModes]] portable-init
  *    recipe on ids;
  *  - assign: argmin Σ_pos (q − c)², ties → lowest centroid id;
  *  - update: centroid component = floor(Σ q / n) over members; an
  *    EMPTY cluster keeps its stale center (the q14 oracle rule — a
  *    reseed heuristic would be scan-order-dependent).
  *
  * Shape per iteration: one component-grain join (vectors × k on
  * pos — fan-out k, never pairwise), one map-side-combined distance
  * aggregation, one argmin window over k rows per vector, one
  * (cid, pos) centroid aggregation; centroid tables are k·dim rows,
  * localCheckpointed per pass to cut lineage. Int64 bound: |q| ≤
  * ~2·10⁶ ⇒ squared terms ≤ 4·10¹², safe past 10⁶ dims per vector
  * and 10⁶ members per (cid, pos) sum.
  */
object KMeansQ {

  /** Final assignment (id, cluster, dist) after `maxIter` Lloyd
    * passes; `dist` is the exact integer squared-L2 to the final
    * centroid. With fewer than `k` distinct vectors, k CLAMPS to the
    * vector count (a valid clustering with fewer clusters — the
    * pre-round-15 contract; an empty input yields an empty
    * assignment). [[KPrototypes.fit]] deliberately RAISES in the same
    * situation instead: its estimator's model shape (k fixed-size
    * center arrays) cannot represent a clamped fit, so the mixed
    * operator fails loudly rather than persist phantom centers.
    */
  def fit(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      maxIter: Int,
      seed: Long): DataFrame = {
    require(k >= 2 && k <= 1024, "k in [2, 1024]")
    require(maxIter >= 1 && maxIter <= 64, "maxIter in [1, 64]")
    import org.apache.spark.sql.expressions.Window
    val q = df.where(col(embCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        posexplode(transform(col(embCol).cast("array<double>"),
          x => floor(x * lit(1000000.0)).cast("long")))
          .as(Seq("pos", "qv")))
      .localCheckpoint(true)
    // seed ranking: orderBy+limit compiles to a DISTRIBUTED top-k
    // (TakeOrderedAndProject), so the rank window only ever sorts the
    // k survivors — never a single-partition pass over the full id set
    // (round-15 fix, same recipe as KPrototypes; ordering unchanged)
    val ids = q.select(col("id")).distinct()
      .select(col("id"),
        graft.functions.PortableHash.hash60(col("id"), seed.toString)
          .as("__h"))
    val seedRank = Window.orderBy(col("__h").asc, col("id").asc)
    val seeds = ids.orderBy(col("__h").asc, col("id").asc).limit(k)
      .withColumn("__r", row_number().over(seedRank))
      .select(col("id"), (col("__r") - 1).cast("long").as("cid"))
      .localCheckpoint(true)
    // Fewer distinct vectors than k: CLAMP k to the seed count and
    // proceed (kEff clusters, cids 0..kEff−1) — the pre-round-15
    // contract, restored per the round-15 ADVICE: the phantom-cluster
    // hazard was never in the semantics, only in running the
    // conditional-sum plan with unseeded cids (a sum over nothing is 0
    // and would beat every real distance), and clamping the sum count
    // removes it without breaking n < k callers. Zero vectors degrade
    // to an empty assignment, the same as pre-15. (One bounded ≤k-row
    // count on the reused checkpoint.)
    val kEff = math.min(k.toLong, seeds.count()).toInt
    if (kEff == 0)
      return q.select(col("id"), col("pos").cast("long").as("cluster"),
        col("qv").as("dist")).where(lit(false))
    var centroids = q.join(seeds, Seq("id"))
      .select(col("cid"), col("pos"), col("qv").as("cv"))
      .localCheckpoint(true)
    // Assignment plan (the probe-tuned KPrototypes recipe, same
    // semantics by q204's full-replay hash oracle): for k ≤
    // [[KPrototypes.condSumMaxK]] the whole assignment is ONE
    // groupBy(id) with k conditional sums and an array-arithmetic
    // argmin (first-position min = ties to the lowest cid) — no
    // (id × k) intermediate; larger k falls back to the two-level
    // min_by plan ordered by struct(__d, cid), the same (dist ASC,
    // cid ASC) rule.
    def assign(c: DataFrame): DataFrame = {
      val terms = q.join(c, Seq("pos"))
        .select(col("id"), col("cid"),
          ((col("qv") - col("cv")) * (col("qv") - col("cv"))).as("__t"))
      if (kEff <= KPrototypes.condSumMaxK) {
        val sums = (0 until kEff).map(i =>
          sum(when(col("cid") === i.toLong, col("__t"))
            .otherwise(lit(0L))).as(s"__d$i"))
        val dArr = array((0 until kEff).map(i => col(s"__d$i")): _*)
        terms.groupBy(col("id"))
          .agg(sums.head, sums.tail: _*)
          .select(col("id"),
            graft.functions.Distances.argminIndex(dArr)
              .cast("long").as("cid"),
            array_min(dArr).as("dist"))
      } else {
        terms.groupBy(col("id"), col("cid"))
          .agg(sum(col("__t")).as("__d"))
          .groupBy(col("id"))
          .agg(min_by(struct(col("cid"), col("__d")),
            struct(col("__d"), col("cid"))).as("__best"))
          .select(col("id"), col("__best.cid").as("cid"),
            col("__best.__d").as("dist"))
      }
    }
    var i = 0
    while (i < maxIter) {
      val asg = assign(centroids)
      val updated = q.join(asg.select(col("id"), col("cid")), Seq("id"))
        .groupBy(col("cid"), col("pos"))
        .agg(floor(sum(col("qv")).cast("double") /
          count(lit(1)).cast("double")).cast("long").as("__new"))
      // stale-center rule: clusters that lost every member keep their
      // previous coordinates rather than reseeding nondeterministically
      centroids = centroids.join(updated, Seq("cid", "pos"), "left")
        .select(col("cid"), col("pos"),
          coalesce(col("__new"), col("cv")).as("cv"))
        .localCheckpoint(true)
      i += 1
    }
    assign(centroids).withColumnRenamed("cid", "cluster")
  }
}
