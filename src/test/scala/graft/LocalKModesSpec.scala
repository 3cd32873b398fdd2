package graft

import graft.operators.LocalKModes
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Unit + property tests for the driver-local K-modes (SURVEY §6 tiers
  * 1-2) — also the brute-force oracle for the distributed fit.
  * (Property tests are seed loops: the scalatest⇄scalacheck bridge
  * artifact is not in the offline cache.)
  */
class LocalKModesSpec extends AnyFunSuite {

  private def planted(n: Int, f: Int, groups: Int, seed: Int): Array[Array[String]] = {
    val rnd = new Random(seed)
    Array.tabulate(n) { i =>
      val g = i % groups
      Array.tabulate(f) { j =>
        // each group has its own dominant value per attribute, 10% noise
        if (rnd.nextDouble() < 0.9) s"g${g}v$j" else s"n${rnd.nextInt(3)}"
      }
    }
  }

  test("hamming: simple matching distance, length-diff padded") {
    assert(LocalKModes.hamming(Array("a", "b"), Array("a", "b")) == 0)
    assert(LocalKModes.hamming(Array("a", "b"), Array("a", "c")) == 1)
    assert(LocalKModes.hamming(Array("a"), Array("a", "c")) == 1)
  }

  test("initCenters: deterministic, distinct, independent of input order") {
    val data = planted(100, 4, 3, 7)
    val a = LocalKModes.initCenters(data, 5, 42L)
    val b = LocalKModes.initCenters(new Random(1).shuffle(data.toSeq).toArray, 5, 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).distinct.length == a.length)
  }

  test("fit recovers planted groups with high purity") {
    val data = planted(600, 6, 3, 11)
    val r = LocalKModes.fit(data, 3, 20, 42L)
    assert(r.centers.length == 3)
    // purity: majority true-group per cluster
    val byCluster = data.indices.groupBy(r.assignments)
    val purity = byCluster.values.map { idxs =>
      idxs.groupBy(_ % 3).values.map(_.size).max.toDouble / idxs.size
    }.sum / byCluster.size
    assert(purity > 0.9, s"purity $purity")
  }

  test("fitted centers are per-attribute modes of their clusters") {
    val data = planted(300, 4, 3, 13)
    val r = LocalKModes.fit(data, 3, 20, 42L)
    val byCluster = data.indices.groupBy(r.assignments)
    byCluster.foreach { case (c, idxs) =>
      val rows = idxs.map(data)
      (0 until 4).foreach { f =>
        val freq = rows.groupBy(_(f)).map { case (v, rs) => v -> rs.size }
        val mode = freq.minBy { case (v, cnt) => (-cnt, v) }._1
        assert(r.centers(c)(f) == mode, s"cluster $c attr $f")
      }
    }
  }

  test("predict(center_i) == i (centers are their own nearest mode)") {
    val data = planted(300, 4, 3, 17)
    val r = LocalKModes.fit(data, 3, 20, 42L)
    r.centers.zipWithIndex.foreach { case (ctr, i) =>
      val dists = r.centers.map(LocalKModes.hamming(ctr, _))
      assert(dists.indexOf(dists.min) == i)
    }
  }

  test("cost non-increasing with more iterations") {
    val data = planted(400, 5, 4, 19)
    val costs = (1 to 6).map(mi => LocalKModes.fit(data, 4, mi, 42L).cost)
    costs.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, costs.toString) }
  }

  test("k > distinct rows degrades gracefully") {
    val data = Array(Array("x", "y"), Array("x", "y"), Array("a", "b"))
    val r = LocalKModes.fit(data, 5, 10, 42L)
    assert(r.centers.length == 2) // only 2 distinct rows
    assert(r.cost == 0.0)
  }

  test("property: fit is permutation-invariant") {
    val data = planted(120, 3, 2, 23)
    val a = LocalKModes.fit(data, 2, 10, 42L)
    (0 until 25).foreach { shuffleSeed =>
      val shuffled = new Random(shuffleSeed).shuffle(data.toSeq).toArray
      val b = LocalKModes.fit(shuffled, 2, 10, 42L)
      assert(a.centers.map(_.toSeq).toSeq == b.centers.map(_.toSeq).toSeq)
      assert(math.abs(a.cost - b.cost) < 1e-12)
    }
  }

  test("metaCluster handles P×k mode matrix") {
    val modes = planted(12, 4, 3, 29)
    val r = LocalKModes.metaCluster(modes, 3, 10, 42L)
    assert(r.centers.length == 3)
  }
}
