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
}
