package graft.operators

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

/** Driver-local / per-partition K-modes on plain arrays.
  *
  * This is our own implementation of what the reference DELEGATED to the
  * external `kmodes` PyPI package for stage 2 (meta-clustering of the
  * collected per-partition modes) [UP pyspark_kmodes/pyspark_kmodes.py
  * ~L295-330 `from kmodes.kmodes import KModes` | conf=H], and of the
  * per-partition Lloyd pass of stage 1 [UP iter_k_modes ~L150-220 |
  * conf=M]. ~100 LoC, zero Spark dependencies, fully deterministic:
  *   - init: k distinct rows in (murmur3(row, seed)) order;
  *   - assignment ties → lowest cluster index (numpy-argmin first-wins);
  *   - mode ties → (count DESC, value ASC);
  *   - empty cluster → reseeded from the record farthest from its center
  *     (distance DESC, hash ASC) — SURVEY §8.3.
  *
  * Also used as the brute-force test oracle for the distributed fit
  * (same init order + same tie-breaks ⇒ identical centers).
  */
object LocalKModes {

  final case class Result(
      centers: Array[Array[String]],
      assignments: Array[Int],
      cost: Double,
      iterations: Int)

  def rowHash(row: Array[String], seed: Long): Int =
    MurmurHash3.arrayHash(row, MurmurHash3.stringHash(seed.toString))

  def hamming(a: Array[String], b: Array[String]): Int = {
    var d = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      if (a(i) != b(i)) d += 1
      i += 1
    }
    d + math.abs(a.length - b.length)
  }

  /** Frequency-weighted dissimilarity (SURVEY §3.1 R5, conf=M): matching
    * positions contribute `1 - freq(center_value)/cluster_size` instead of
    * 0, so matches against "weak" (low-consensus) mode values still cost
    * something. Used for stage-2 meta-clustering per the ensemble paper.
    */
  def frequencyDissim(
      a: Array[String],
      center: Array[String],
      freqs: Array[collection.Map[String, Long]],
      size: Long): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) {
      if (a(i) != center(i)) d += 1.0
      else if (size > 0) d += 1.0 - freqs(i).getOrElse(a(i), 0L).toDouble / size
      i += 1
    }
    d
  }

  /** Deterministic seeded init: k distinct rows in murmur-hash order. */
  def initCenters(data: Array[Array[String]], k: Int, seed: Long): Array[Array[String]] =
    data.distinctBy(_.toSeq)
      .sortBy(r => (rowHash(r, seed), r.toSeq))(
        Ordering.Tuple2(Ordering.Int, Ordering.Implicits.seqOrdering[Seq, String]))
      .take(k)

  def fit(
      data: Array[Array[String]],
      k: Int,
      maxIter: Int,
      seed: Long,
      useFrequency: Boolean = false): Result = {
    require(data.nonEmpty, "LocalKModes.fit on empty data")
    val nf = data(0).length
    var centers = initCenters(data, k, seed)
    val kEff = centers.length // may be < k when distinct rows < k
    val assign = new Array[Int](data.length)
    java.util.Arrays.fill(assign, -1)

    var iter = 0
    var moved = true
    var cost = 0.0
    // frequency tables of the PREVIOUS iteration, for R5's
    // frequency-weighted dissimilarity (ensemble paper, stage 2);
    // first pass has no history -> plain Hamming
    var prevFreqs: Array[Array[collection.Map[String, Long]]] = null
    var prevSizes: Array[Long] = null
    // cluster stats, rebuilt each pass (batch Lloyd, matches R7 semantics)
    while (iter < maxIter && moved) {
      moved = false
      cost = 0.0
      val freqs = Array.fill(kEff, nf)(mutable.Map.empty[String, Long])
      val sizes = new Array[Long](kEff)
      // assignment pass
      var r = 0
      while (r < data.length) {
        val row = data(r)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          val d =
            if (useFrequency && prevFreqs != null && prevSizes(c) > 0)
              frequencyDissim(row, centers(c), prevFreqs(c), prevSizes(c))
            else hamming(row, centers(c)).toDouble
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (best != assign(r)) { moved = true; assign(r) = best }
        cost += bestD
        sizes(best) += 1
        var f = 0
        while (f < nf) {
          val m = freqs(best)(f)
          m.update(row(f), m.getOrElse(row(f), 0L) + 1L)
          f += 1
        }
        r += 1
      }
      // update pass: per-attribute mode, tie-break (count DESC, value ASC)
      var c = 0
      while (c < kEff) {
        if (sizes(c) == 0) {
          // deterministic reseed: farthest record from its own center
          val far = data.zipWithIndex.maxBy { case (row, i) =>
            (hamming(row, centers(assign(i))), -rowHash(row, seed + c))
          }._1
          centers(c) = far.clone()
          moved = true
        } else {
          val nc = Array.tabulate(nf) { f =>
            freqs(c)(f).minBy { case (v, cnt) => (-cnt, v) }._1
          }
          if (!java.util.Arrays.equals(
              nc.asInstanceOf[Array[AnyRef]],
              centers(c).asInstanceOf[Array[AnyRef]])) {
            centers(c) = nc
            moved = true
          }
        }
        c += 1
      }
      prevFreqs = freqs.map(_.map(m => m: collection.Map[String, Long]))
      prevSizes = sizes
      iter += 1
    }
    // final assignment against final centers (so cost matches centers)
    cost = 0.0
    var r = 0
    while (r < data.length) {
      var best = 0
      var bestD = Int.MaxValue
      var c = 0
      while (c < kEff) {
        val d = hamming(data(r), centers(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      assign(r) = best
      cost += bestD
      r += 1
    }
    Result(centers, assign, if (data.isEmpty) 0.0 else cost / data.length, iter)
  }

  /** Meta-cluster collected stage-1 modes (R11). `useFrequency` switches
    * assignment to the frequency-weighted dissimilarity of the ensemble
    * paper (R5): matching positions cost 1 - freq(value)/cluster_size
    * using the PREVIOUS iteration's tables (first pass is plain Hamming).
    * The reference's exact stage-2 ranking is conf=M (SURVEY §3.1), so
    * both variants are exposed; `KModes.distance` selects one.
    */
  def metaCluster(
      modes: Array[Array[String]],
      k: Int,
      maxIter: Int,
      seed: Long,
      useFrequency: Boolean = false): Result =
    fit(modes, k, maxIter, seed, useFrequency)
}
