package graft.tools

import graft.Fixtures
import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession

/** Regenerates the committed dHash golden table
  * (`fixtures/dhash_golden.parquet`) that pins q241's decoder-dependent
  * perceptual hashes.
  *
  * Same rationale as [[JpegGolden]]: the q241 fixture is JPEG (lossy),
  * so the decoded luma grid — and therefore the dHash — is a property
  * of the JDK's ImageIO decoder, not of the pixel formula alone. The
  * pairing/blocking math downstream of the hash is exact integer
  * arithmetic the oracle replays (all-pairs bit_count(xor) ≤ maxDist);
  * only the hash value itself needs a pin. One row per
  * (class, quality-variant): [[Fixtures.DhashClasses]] × 2 rows, fixed
  * forever — `doc_id % DhashClasses` and `(doc_id / DhashClasses) % 2`
  * index every doc id at every scale factor.
  *
  * Usage: `sbt "runMain graft.tools.DhashGolden [outPath]"`.
  */
object DhashGolden {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/dhash_golden.parquet")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("dhash-golden")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val rows = for {
      gid <- 0L until Fixtures.DhashClasses
      variant <- 0 to 1
    } yield {
      val dh = Multimodal.dhash64(Fixtures.dhashMedia(gid, variant)).getOrElse(
        sys.error(s"golden generation: dhash64 failed to decode its own " +
          s"JPEG for class $gid variant $variant"))
      (gid, variant, dh)
    }
    rows.toDF("gid", "variant", "dh")
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    println(s"wrote ${rows.size} golden rows to $out")
    spark.stop()
  }
}
