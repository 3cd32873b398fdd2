package graft

import graft.operators.SpatialJoin
import org.apache.spark.sql.functions._
import scala.util.Random

/** Grid-blocked radius join: completeness vs brute force (the 3×3
  * pigeonhole must lose nothing), exact boundary behavior, negative
  * coordinates, and the hub-cell guard.
  */
class SpatialJoinSpec extends SparkSuite {
  import spark.implicits._

  test("matches brute force on random points, including negatives") {
    val rnd = new Random(7)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(2000).toLong - 1000, rnd.nextInt(2000).toLong - 1000))
    val df = pts.toDF("id", "x", "y")
    val r = 150L
    val got = SpatialJoin.radiusSelfPairs(df, "id", "x", "y", r)
      .select("id_a", "id_b", "d2").as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r * r
    } yield (a, b, d2)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "fixture must produce pairs")
  }

  test("boundary: d2 == radius^2 kept, one past dropped; cross-cell pairs found") {
    // radius 10: (0,0)-(10,0) exactly on the boundary (different cells);
    // (0,0)-(10,1) just outside
    val df = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 10L, 1L))
      .toDF("id", "x", "y")
    val got = SpatialJoin.radiusSelfPairs(df, "id", "x", "y", 10L)
      .select("id_a", "id_b", "d2").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 100L), (2L, 3L, 1L)), s"$got")
  }

  test("hub cell raises; empty input stays empty") {
    val hub = (1L to 50L).map(i => (i, 5L, 5L)).toDF("id", "x", "y")
    val e = intercept[Exception] {
      SpatialJoin.radiusSelfPairs(hub, "id", "x", "y", 100L,
        maxCellSize = 10).collect()
    }
    assert(e.getMessage.contains("quadratic"), e.getMessage)
    assert(SpatialJoin.radiusSelfPairs(hub.limit(0), "id", "x", "y", 10L)
      .count() == 0)
  }

  test("dbscan: hand-built clusters, border min-label rule, noise") {
    // cluster A: 5 points in a tight blob at (0..4, 0) radius 10 ->
    //   all within r of each other, minPts=5 -> all core, label 1
    // cluster B: 5 points at (1000..1004, 0) -> label 20
    // border: (12, 0) within r=10 of A's (4,0) only -> 1 neighbor,
    //   not core, has core neighbor -> border, cluster 1
    // noise: (500, 500) alone
    val pts = (
      (1L to 5L).map(i => (i, i - 1, 0L)) ++
      (20L to 24L).map(i => (i, 1000L + (i - 20), 0L)) ++
      Seq((50L, 12L, 0L), (60L, 500L, 500L))
    ).toDF("id", "x", "y")
    val got = SpatialJoin.dbscan(pts, "id", "x", "y", radius = 10L,
        minPts = 5)
      .as[(Long, String, java.lang.Long)].collect()
      .map(r => r._1 -> (r._2, Option(r._3).map(_.toLong))).toMap
    (1L to 5L).foreach(i => assert(got(i) == ("core", Some(1L)), s"$i"))
    (20L to 24L).foreach(i => assert(got(i) == ("core", Some(20L)), s"$i"))
    assert(got(50L) == ("border", Some(1L)))
    assert(got(60L) == ("noise", None))
  }

  test("dbscan: singleton core (minPts=1) labels itself; border picks SMALLEST cluster") {
    // two 4-point cores (minPts=4) with a point touching one core of
    // each cluster: 99 at (17,0) reaches id 4 (d=14) and id 10 (d=14)
    // only -> 2 neighbors + itself = 3 < 4, a border of BOTH clusters
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L), (4L, 3L, 0L),
      (10L, 31L, 0L), (11L, 32L, 0L), (12L, 33L, 0L), (13L, 34L, 0L),
      (99L, 17L, 0L),
      (42L, 500L, 500L)) // isolated
      .toDF("id", "x", "y")
    val got = SpatialJoin.dbscan(pts, "id", "x", "y", radius = 14L,
        minPts = 4)
      .as[(Long, String, java.lang.Long)].collect()
      .map(r => r._1 -> (r._2, Option(r._3).map(_.toLong))).toMap
    assert(got(99L) == ("border", Some(1L)), s"tie must go small: $got")
    assert(got(42L) == ("noise", None))
    val solo = SpatialJoin.dbscan(
        Seq((7L, 5L, 5L)).toDF("id", "x", "y"), "id", "x", "y",
        radius = 10L, minPts = 1)
      .as[(Long, String, java.lang.Long)].collect()
    assert(solo.toSeq == Seq((7L, "core", 7L)), solo.mkString(","))
  }
}
