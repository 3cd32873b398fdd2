package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §3.3): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction / frame sampling run as batched per-partition transforms.
  *
  * Decode is REAL for uncompressed PCM WAV audio ([[decodeWav]] — RIFF
  * is a trivial byte-level format needing no codec library) and STUBBED
  * for compressed formats (`decodeStub` — the image/video codec
  * libraries are not in this container; it derives deterministic fake
  * features from the raw bytes). [[decode]] dispatches on the RIFF
  * magic. Everything around the stub is real and tested: the schema
  * contract, the `mapPartitions` batch shape (one buffer reused per
  * partition, no per-row allocation of the decode context), the
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

  /** Parsed PCM WAV header. `nFrames` = sample frames (per channel). */
  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int, nFrames: Int)

  /** REAL decoder for uncompressed PCM WAV (RIFF): pure byte-level
    * parsing — no codec dependency. Walks the chunk list for `fmt ` and
    * `data`, then computes actual audio features over the samples:
    * [duration s, RMS, peak, zero-crossing rate, channels,
    * sampleRate/1000, bits, 0] (fixed [[FeatureDim]] width so the
    * downstream contract is decoder-independent). Returns None for
    * anything that is not a well-formed PCM WAV (compressed audio,
    * truncated files) — the caller falls back to the stub.
    */
  def decodeWav(media: Array[Byte]): Option[(WavInfo, Array[Float])] = {
    def le32(o: Int) = (media(o) & 0xff) | ((media(o + 1) & 0xff) << 8) |
      ((media(o + 2) & 0xff) << 16) | ((media(o + 3) & 0xff) << 24)
    def le16(o: Int) = (media(o) & 0xff) | ((media(o + 1) & 0xff) << 8)
    def tag(o: Int) = new String(media, o, 4, "US-ASCII")
    if (media.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var info: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var data: Option[(Int, Int)] = None      // (offset, len)
    while (off + 8 <= media.length && (info.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val len = le32(off + 4)
      // bounds math in Long: a corrupt len near Int.MaxValue would wrap
      // `off + 8 + len` negative and slip past an Int comparison,
      // turning the documented None-fallback into an array crash
      if (len < 0 || off.toLong + 8L + len > media.length) return None
      if (id == "fmt " && len >= 16) {
        if (le16(off + 8) != 1) return None // 1 = uncompressed PCM
        info = Some((le32(off + 12), le16(off + 10), le16(off + 22)))
      } else if (id == "data") {
        data = Some((off + 8, len))
      }
      off += 8 + len + (len & 1) // chunks are word-aligned; len bounded above
    }
    for ((rate, channels, bits) <- info; (dOff, dLen) <- data;
         if rate > 0 && channels > 0 && bits == 16) yield {
      val nSamples = dLen / 2
      val nFrames = nSamples / channels
      var sumSq = 0.0; var peak = 0.0; var crossings = 0L
      var i = 0
      while (i < nSamples) {
        val s = (le16(dOff + i * 2).toShort).toDouble / 32768.0
        sumSq += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
        // zero crossings PER CHANNEL: samples are interleaved, so the
        // previous sample of this channel is `channels` back — comparing
        // i-1 would cross-compare L against R on stereo input
        if (i >= channels &&
            (s < 0) != (le16(dOff + (i - channels) * 2).toShort < 0)) {
          crossings += 1
        }
        i += 1
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
      val zcr = if (nSamples <= channels) 0.0
        else crossings.toDouble / (nSamples - channels)
      val duration = nFrames.toDouble / rate
      val feats = Array[Float](duration.toFloat, rms.toFloat, peak.toFloat,
        zcr.toFloat, channels.toFloat, rate / 1000.0f, bits.toFloat, 0.0f)
      (WavInfo(rate, channels, bits, nFrames), feats)
    }
  }

  /** Format dispatch: real WAV parse when the RIFF magic matches,
    * deterministic stub otherwise.
    */
  def decode(media: Array[Byte]): (Int, Array[Float]) =
    (if (media.length >= 12 && media(0) == 'R' && media(1) == 'I' &&
         media(2) == 'F' && media(3) == 'F')
       decodeWav(media).map { case (info, feats) => (info.nFrames, feats) }
     else None).getOrElse(decodeStub(media))

  /** Decode + feature-extract, one batched pass per partition. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    assets.mapPartitions { it =>
      // any per-partition decoder context (native handles, buffers) is
      // initialized once here, not per record
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val media = if (a.media == null) Array.emptyByteArray else a.media
        val (nFrames, feats) = decode(media)
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
