package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zValue interleaves bits exactly") {
    // x=5 (101b) → bits at 0,4 = 17; y=3 (011b) → bits at 1,3 = 10
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].head()
    assert(got == 27L)
    // identity checks: z(0,0)=0, z(max,max)=2^(2b)-1
    val corners = Seq((0L, 0L), (7L, 7L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].collect().toSeq
    assert(corners == Seq(0L, 63L))
  }

  test("zValue preserves locality ordering within a quadrant") {
    // Morton property: z >> 2k groups points into 2^k x 2^k cells.
    // All 4 points of the cell [0,2)x[0,2) sort before any point of
    // [2,4)x[2,4).
    val pts = for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)
    val z = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 2).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val lowCell = for (x <- 0L to 1L; y <- 0L to 1L) yield z((x, y))
    val highCell = for (x <- 2L to 3L; y <- 2L to 3L) yield z((x, y))
    assert(lowCell.max < highCell.min)
    assert(lowCell.sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("zValue raises on out-of-domain coordinates") {
    val neg = intercept[Exception] {
      Seq((-1L, 0L)).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"), 3)).collect()
    }
    assert(neg.getMessage.contains("out of [0, 8)"))
    val big = intercept[Exception] {
      Seq((0L, 8L)).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"), 3)).collect()
    }
    assert(big.getMessage.contains("out of [0, 8)"))
  }

  test("boxScan prunes zones by min/max overlap exactly") {
    // 8x8 grid, zones = 2x2 cells via z >> 2 (16 zones, 4 rows each)
    val pts = (for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y)).toDF("x", "y")
    val z = pts.withColumn("z", Layout.zValue(col("x"), col("y"), 3))
    val zones = Layout.zoneProfile(z, shiftright(col("z"), 2), "x", "y")
    assert(zones.count() == 16)
    // box [1,2]x[1,2] overlaps the 4 cells around the corner (1..2 spans
    // cells 0..1 on each axis) → 4 zones, 16 rows touched
    val r = Layout.boxScan(zones, 1, 2, 1, 2).head()
    assert(r.getAs[Long]("n_zones") == 16 && r.getAs[Long]("n_rows") == 64)
    assert(r.getAs[Long]("zones_touched") == 4 &&
      r.getAs[Long]("rows_touched") == 16)
  }

  test("z-order layout touches fewer rows than a single-column sort") {
    // 32x32 grid; both layouts get 16-row zones. A small 2-D box is
    // selective on both axes under z-order but only on x under by-x.
    val pts = (for (x <- 0L to 31L; y <- 0L to 31L) yield (x, y)).toDF("x", "y")
    val z = pts.withColumn("z", Layout.zValue(col("x"), col("y"), 5))
    val zZones = Layout.zoneProfile(z, shiftright(col("z"), 4), "x", "y")
    val xZones = Layout.zoneProfile(pts, shiftright(col("x"), 4), "x", "y")
    val zTouch = Layout.boxScan(zZones, 4, 7, 4, 7).head().getAs[Long]("rows_touched")
    val xTouch = Layout.boxScan(xZones, 4, 7, 4, 7).head().getAs[Long]("rows_touched")
    assert(zTouch == 16, s"4x4 box inside one 4x4 z-cell, got $zTouch")
    assert(xTouch == 512, s"by-x zone spans all of y, got $xTouch")
  }

  test("boxScan on an empty profile reports zeros") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val zones = Layout.zoneProfile(empty, col("x"), "x", "y")
    val r = Layout.boxScan(zones, 0, 10, 0, 10).head()
    assert(r.getAs[Long]("n_zones") == 0 && r.getAs[Long]("n_rows") == 0 &&
      r.getAs[Long]("zones_touched") == 0 && r.getAs[Long]("rows_touched") == 0)
  }

  test("compactionPlan: greedy prefix packing, oversized files, gaps") {
    val files = Seq(
      ("A", 1L, 3L), ("A", 2L, 3L), ("A", 3L, 3L), ("A", 4L, 10L), ("A", 5L, 2L),
      ("B", 1L, 1L))
      .toDF("p", "d", "sz")
    val got = Layout.compactionPlan(files, Seq("p"), "d", "sz", targetBytes = 4L)
      .orderBy("p", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // A cums: 3,6,9,19,21 → bins (cum-sz) div 4 = 0,0,1,2,4
    assert(got == Seq(
      ("A", 0L, 2L, 6L, 1500000L),   // closed past target
      ("A", 1L, 1L, 3L, 750000L),
      ("A", 2L, 1L, 10L, 2500000L),  // oversized file alone
      ("A", 4L, 1L, 2L, 500000L),    // id gap after the oversized file
      ("B", 0L, 1L, 1L, 250000L)))
  }

  test("compactionPlan: order-key ties land in one bin deterministically") {
    val files = Seq(("A", 1L, 3L), ("A", 1L, 3L), ("A", 2L, 1L))
      .toDF("p", "d", "sz")
    val got = Layout.compactionPlan(files, Seq("p"), "d", "sz", targetBytes = 4L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // RANGE frame: both tied files see cum=6 → bin (6-3) div 4 = 0
    assert(got == Seq((0L, 2L, 6L), (1L, 1L, 1L)))
  }

  test("zValue rejects bad bit widths") {
    intercept[IllegalArgumentException](Layout.zValue(col("x"), col("y"), 0))
    intercept[IllegalArgumentException](Layout.zValue(col("x"), col("y"), 32))
  }
}
