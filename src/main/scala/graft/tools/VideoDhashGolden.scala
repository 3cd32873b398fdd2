package graft.tools

import graft.Fixtures
import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession

/** Regenerates the committed per-frame video dHash golden table
  * (`fixtures/video_dhash_golden.parquet`) that pins q243's
  * decoder-dependent perceptual frame hashes.
  *
  * Same rationale as [[DhashGolden]] (q241): the q243 fixture's frames
  * are JPEG (lossy), so each frame's decoded luma grid — and therefore
  * its dHash — is a property of the JDK's ImageIO decoder; the
  * sequence grouping downstream is exact string arithmetic the oracle
  * replays. One row per (class, quality-variant, frame):
  * [[Fixtures.VideoPerceptClasses]] × 2 variants × (2–4 frames), fixed
  * forever — `doc_id % VideoPerceptClasses` and
  * `(doc_id / VideoPerceptClasses) % 2` index every doc id at every
  * scale factor.
  *
  * Generation FAILS loudly if any frame of any class hashes
  * differently across the two qualities — that invariance is the
  * fixture's design contract (cell steps ≥ 20 luma units, the
  * [[Fixtures.dhashPattern]] margin), and a silent violation would
  * make the engine's cross-variant collapse diverge from the oracle's.
  *
  * Usage: `sbt "runMain graft.tools.VideoDhashGolden [outPath]"`.
  */
object VideoDhashGolden {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/video_dhash_golden.parquet")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("video-dhash-golden")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val rows = for {
      gid <- 0L until Fixtures.VideoPerceptClasses
      variant <- 0 to 1
      media = Fixtures.videoPerceptMedia(gid, variant)
      (idx, payload) <- Multimodal.framePayloads(media).getOrElse(
        sys.error(s"golden generation: AVI walk failed for class $gid " +
          s"variant $variant"))._2
    } yield {
      val dh = Multimodal.dhash64(payload).getOrElse(
        sys.error(s"golden generation: dhash64 failed on frame $idx of " +
          s"class $gid variant $variant"))
      (gid, variant, idx, dh)
    }
    val byKey = rows.groupBy(r => (r._1, r._3)).values
    byKey.foreach { vs =>
      require(vs.map(_._4).distinct.size == 1,
        s"variant invariance violated for (class, frame) " +
          s"(${vs.head._1}, ${vs.head._3}): ${vs.map(_._4)}")
    }
    rows.toDF("gid", "variant", "frame_idx", "dh")
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    println(s"wrote ${rows.size} golden rows to $out")
    spark.stop()
  }
}
