package graft.tools

import graft.{Fixtures, Queries}
import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession

/** Regenerates the committed video golden table
  * (`fixtures/video_golden.parquet`) that pins q231's decoder-dependent
  * per-frame pixel statistics — the MJPEG-in-AVI twin of [[JpegGolden]].
  *
  * Same rationale: MJPEG frames are JPEGs, and JPEG decode is a
  * property of the DECODER (IDCT rounding), so the per-frame luma/edge
  * sums and the encoder's byte lengths are pinned by this table while
  * everything container-level (frame count, geometry, timestamps) is
  * formula-oracled exactly. The pin is generated end to end through the
  * REAL pipeline — [[Fixtures.videoAssetFor]] encodes the AVI,
  * [[Multimodal.decodeAvi]] walks the container and decodes every frame
  * — so a regression anywhere on that path shifts the golden values and
  * fails q231 loudly.
  *
  * One row per (geometry class, frame): pixels reduce mod 256, w/h mod
  * 8/5, frame count mod 4, so `doc_id % 1280` indexes every doc id at
  * every scale factor; frame counts are 2..5 → ~4480 rows forever.
  *
  * Usage: `sbt "runMain graft.tools.VideoGolden [outPath]"`.
  */
object VideoGolden {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/video_golden.parquet")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("video-golden")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val rows = (0L until Fixtures.VideoGeomPeriod).flatMap { gid =>
      val asset = Fixtures.videoAssetFor(gid)
      val (info, frames) = Multimodal.decodeAvi(asset.media).getOrElse(
        sys.error(s"golden generation: decodeAvi failed on its own AVI " +
          s"for geometry $gid"))
      require(frames.size == Fixtures.videoNFrames(gid) &&
        info.totalFrames == frames.size,
        s"golden generation: geometry $gid decoded ${frames.size} of " +
          s"${Fixtures.videoNFrames(gid)} frames")
      frames.map(f => (gid, f.frameIdx, f.byteLen.toLong,
        f.stats.lumaSum, f.stats.nPixels, f.stats.edgeCount, f.stats.hPairs))
    }
    rows.toDF("gid", "frame_idx", "byte_len",
        "luma_sum", "n_pixels", "edge_count", "h_pairs")
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    println(s"wrote ${rows.size} golden rows to $out")
    spark.stop()
  }
}
