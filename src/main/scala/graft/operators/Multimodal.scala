package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §3.3): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction / frame sampling run as batched per-partition transforms.
  *
  * The actual media decode is STUBBED (`decodeStub` — the image/audio
  * libraries are not in this container): it derives deterministic fake
  * features from the raw bytes. Everything around it is real and tested:
  * the schema contract, the `mapPartitions` batch shape (one buffer reused
  * per partition, no per-row allocation of the decode context), the
  * partition sizing notes, and the downstream columnar handoff.
  *
  * 100 TB design notes:
  *  - Media bytes never hit the driver; the decode stage is a narrow
  *    `mapPartitions` — no shuffle. Partition sizing for binary-heavy
  *    tables should come from `spark.sql.files.maxPartitionBytes` (bytes,
  *    not rows, dominate).
  *  - Feature outputs are fixed-width (`Array[Float]`), so the downstream
  *    similarity/dedup operators ([[Similarity]]) consume them directly.
  */
object Multimodal {

  /** Typed record for a media asset entering the pipeline. */
  final case class MediaAsset(asset_id: Long, kind: String, media: Array[Byte])

  /** Typed decoded-feature record leaving the pipeline. */
  final case class MediaFeatures(
      asset_id: Long,
      kind: String,
      byte_len: Long,
      content_hash: String,
      n_frames: Int,
      features: Array[Float])

  implicit val assetEnc: Encoder[MediaAsset] = Encoders.product[MediaAsset]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Bytes per stub "frame" — stands in for a decoder's frame stride. */
  val FrameBytes = 256
  val FeatureDim = 8

  /** STUB decoder: where a real implementation would call an image/audio
    * codec, this derives deterministic features from the raw bytes so the
    * full pipeline is testable. Replace the body (only) with a real codec
    * when available; the signature and batch shape are the contract.
    */
  def decodeStub(media: Array[Byte]): (Int, Array[Float]) = {
    val nFrames = math.max(1, (media.length + FrameBytes - 1) / FrameBytes)
    val feats = new Array[Float](FeatureDim)
    var i = 0
    while (i < media.length) {
      feats(i % FeatureDim) += (media(i) & 0xff) / 255.0f
      i += 1
    }
    (nFrames, feats)
  }

  /** Decode + feature-extract, one batched pass per partition. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    assets.mapPartitions { it =>
      // any per-partition decoder context (native handles, buffers) is
      // initialized once here, not per record
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val media = if (a.media == null) Array.emptyByteArray else a.media
        val (nFrames, feats) = decodeStub(media)
        md5.reset()
        val hash = md5.digest(media).map("%02x".format(_)).mkString
        MediaFeatures(a.asset_id, a.kind, media.length.toLong, hash, nFrames, feats)
      }
    }
  }

  /** Deterministic frame sampling: every `stride`-th frame index up to
    * `maxFrames`, as (asset_id, frame_idx, frame_bytes) — the exploded
    * shape a vision model's batch-inference stage consumes.
    */
  def sampleFrames(
      assets: Dataset[MediaAsset],
      stride: Int,
      maxFrames: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      val media = if (a.media == null) Array.emptyByteArray else a.media
      val nFrames = math.max(1, (media.length + FrameBytes - 1) / FrameBytes)
      (0 until nFrames by stride).take(maxFrames).map { f =>
        val from = f * FrameBytes
        val until = math.min(from + FrameBytes, media.length)
        (a.asset_id, f, media.slice(from, until))
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes")
  }

  /** Demo wiring over the `documents` table: texts re-encoded as the
    * opaque binary column (stand-in for real image bytes — the testdata
    * ships no binary media), run through the typed decode pipeline.
    */
  def documentFeatures(spark: SparkSession, documents: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val assets = documents
      .select(col("doc_id").as("asset_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaAsset]
    extractFeatures(assets)
  }
}
