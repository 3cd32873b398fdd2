package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §3.3): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction / frame sampling run as batched per-partition transforms.
  *
  * Decode is REAL for every format the fixtures exercise: uncompressed
  * PCM WAV audio ([[decodeWav]] — RIFF is a trivial byte-level format
  * needing no codec library), uncompressed 24-bit BMP and binary PPM
  * images ([[decodeBmp]]/[[decodePpm]], byte-level parsers),
  * compressed-lossless PNG and lossy JPEG ([[decodePng]]/[[decodeJpeg]]
  * via the JDK's built-in javax.imageio — still no external codec), and
  * MJPEG-in-AVI video ([[decodeAvi]] — the RIFF walk composed with the
  * per-frame JPEG decode). [[decode]] dispatches on magic bytes;
  * `decodeStub` remains ONLY as the unknown-format fallback (bytes that
  * match no magic), deriving deterministic features from the raw bytes
  * so arbitrary blobs still flow through the typed pipeline. The
  * surrounding plumbing is uniform: the schema contract, the
  * `mapPartitions` batch shape (one buffer reused per partition, no
  * per-row allocation of the decode context), the partition sizing
  * notes, and the downstream columnar handoff.
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

  /** UNKNOWN-FORMAT fallback (no longer a stub for any supported
    * format — WAV/BMP/PPM/PNG/JPEG/AVI all decode for real): derives
    * deterministic features from the raw bytes so blobs that match no
    * magic (text, protobufs, future codecs) still flow through the
    * typed pipeline instead of failing the task.
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

  /** Raw 16-bit samples of a mono PCM WAV (the [[decodeWav]] chunk walk
    * with the float feature pass replaced by the raw int16 array) —
    * the exact-integer input [[audioPeriodicity]] needs; None for
    * anything malformed, non-PCM, or non-mono (periodicity over
    * interleaved stereo would compare L against R).
    */
  def decodeWavSamples(media: Array[Byte]): Option[(WavInfo, Array[Int])] = {
    def le32(o: Int) = (media(o) & 0xff) | ((media(o + 1) & 0xff) << 8) |
      ((media(o + 2) & 0xff) << 16) | ((media(o + 3) & 0xff) << 24)
    def le16(o: Int) = (media(o) & 0xff) | ((media(o + 1) & 0xff) << 8)
    def tag(o: Int) = new String(media, o, 4, "US-ASCII")
    if (media.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var info: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= media.length && (info.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val len = le32(off + 4)
      if (len < 0 || off.toLong + 8L + len > media.length) return None
      if (id == "fmt " && len >= 16) {
        if (le16(off + 8) != 1) return None
        info = Some((le32(off + 12), le16(off + 10), le16(off + 22)))
      } else if (id == "data") {
        data = Some((off + 8, len))
      }
      off += 8 + len + (len & 1)
    }
    for ((rate, channels, bits) <- info; (dOff, dLen) <- data;
         if rate > 0 && channels == 1 && bits == 16) yield {
      val n = dLen / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = le16(dOff + i * 2).toShort.toInt; i += 1 }
      (WavInfo(rate, channels, bits, n), out)
    }
  }

  /** Minimal mono 16-bit PCM WAV encoder (RIFF + fmt + data), the
    * synthesis twin of [[decodeWavSamples]] for formula-oracled audio
    * queries and specs — the audio sibling of [[encodeBmp]].
    */
  def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def le32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, o)
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, sampleRate); le32(28, sampleRate * 2); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) { le16(44 + i * 2, samples(i)); i += 1 }
    out
  }

  /** Audio periodicity by EXACT integer autocorrelation — the
    * pitch/period detector of a media-curation pipeline (voice vs tone
    * vs noise screens), run over decoded PCM samples: for each lag k in
    * [lagMin, lagMax], R(k) = Σ_t s_t·s_{t+k} on raw int16 samples
    * (int64-exact: |s|≤2¹⁵ ⇒ each term ≤ 2³⁰, safe to ~2³³ samples),
    * best_lag = argmax R(k) with ties to the SMALLEST lag, plus the
    * energy R(0). Every output is an integer an external engine
    * reproduces from the same samples digit-for-digit.
    *
    * 100 TB posture: per-row narrow work inside one mapPartitions
    * (assets are row-opaque bytes — the [[imageStats]] rule); output is
    * asset-grain. Assets that fail the mono-PCM parse are SKIPPED
    * (flatMap), never stubbed — a periodicity of fake samples would be
    * a silent wrong answer.
    */
  def audioPeriodicity(
      assets: Dataset[MediaAsset],
      lagMin: Int,
      lagMax: Int): DataFrame = {
    require(lagMin >= 1 && lagMax >= lagMin && lagMax <= 4096,
      "need 1 <= lagMin <= lagMax <= 4096")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val media = if (a.media == null) Array.emptyByteArray else a.media
        decodeWavSamples(media).map { case (info, s) =>
          val n = s.length
          var r0 = 0L
          var i = 0
          while (i < n) { r0 += s(i).toLong * s(i); i += 1 }
          var bestLag = 0L; var bestR = Long.MinValue
          var k = lagMin
          while (k <= lagMax) {
            var r = 0L; var t = 0
            while (t + k < n) { r += s(t).toLong * s(t + k); t += 1 }
            if (r > bestR) { bestR = r; bestLag = k.toLong }
            k += 1
          }
          (a.asset_id, n.toLong, info.sampleRate.toLong, bestLag, bestR, r0)
        }
      }
    }.toDF("asset_id", "n_samples", "sample_rate", "best_lag", "r_best", "r0")
  }

  /** Amplitude-normalized quantized energy envelope — the PERCEPTUAL
    * audio fingerprint (q242), closing the gap q240's exact signature
    * leaves open: a volume-scaled copy (samples × c) has a different
    * (n, Σs, Σs²) but the SAME energy SHAPE. The clip is cut into
    * `windows` equal time slices (sample t lands in window t·W/n —
    * every window non-empty for n ≥ W), per-window energy
    * E_w = Σ s² is computed in exact Long arithmetic, and each window
    * is quantized RELATIVE to the whole clip:
    * q_w = ⌊E_w · scale / ΣE⌋. Scaling every sample by c multiplies
    * E_w and ΣE by the same c², so the floor of the SAME rational is
    * taken — scaled copies collide EXACTLY, not approximately, which
    * is what lets a formula-replaying oracle cover the query with no
    * golden table. All-silent clips (ΣE = 0) quantize to all-zero.
    *
    * Overflow bound: a 16-bit PCM sample square is < 2³⁰, so
    * E_w < n·2³⁰ and the quantization product E_w·scale stays below
    * 2⁶³ exactly when n·scale < 2³² (at scale = 1000 that is ~4.3M
    * samples ≈ 9 minutes at 8 kHz — any longer clip must be windowed
    * upstream). The `require` pins that envelope so overflow RAISES
    * instead of silently corrupting signatures.
    */
  def energyEnvelope(
      samples: Array[Int], windows: Int, scale: Long): Array[Long] = {
    require(windows >= 1 && scale >= 1, "need windows >= 1, scale >= 1")
    require(samples.length.toLong * scale < (1L << 32),
      s"n·scale = ${samples.length.toLong * scale} exceeds the 2^32 " +
        "overflow envelope (E_w·scale must stay below 2^63)")
    val n = samples.length
    val e = Array.ofDim[Long](windows)
    var t = 0
    while (t < n) {
      e((t.toLong * windows / n).toInt) += samples(t).toLong * samples(t)
      t += 1
    }
    var etot = 0L
    var w = 0
    while (w < windows) { etot += e(w); w += 1 }
    if (etot == 0L) e else e.map(ew => ew * scale / etot)
  }

  /** Decoded image statistics. Sums are INTEGER-exact on purpose:
    * `lumaSum` = Σ (299·R + 587·G + 114·B) over pixels (i.e. luma
    * scaled by 1000·255), `edgeCount` = horizontal neighbor pairs with
    * |Δ scaled-luma| > 25500 (= 0.1 in [0,1] luma). Integer sums are
    * independent of pixel-visit order, so an external engine replaying
    * the pixel formula reproduces them EXACTLY — derived ratios
    * (mean luma, edge density) are then a single correctly-rounded
    * division on either side.
    */
  final case class ImageStats(
      format: String, width: Int, height: Int,
      lumaSum: Long, nPixels: Long, edgeCount: Long, hPairs: Long)

  private def lumaInt(r: Int, g: Int, b: Int): Long =
    299L * r + 587L * g + 114L * b

  /** Per-row luma walk shared by both image decoders: accumulates the
    * scaled-luma sum and >25500-delta horizontal edge count.
    */
  private def scanRows(
      format: String, w: Int, h: Int)(
      rgbAt: (Int, Int) => (Int, Int, Int)): ImageStats = {
    var lumaSum = 0L; var edges = 0L
    var y = 0
    while (y < h) {
      var prev = -1L
      var x = 0
      while (x < w) {
        val (r, g, b) = rgbAt(x, y)
        val li = lumaInt(r, g, b)
        lumaSum += li
        if (x > 0 && math.abs(li - prev) > 25500L) edges += 1
        prev = li
        x += 1
      }
      y += 1
    }
    ImageStats(format, w, h, lumaSum, w.toLong * h,
      edges, math.max(0, w - 1).toLong * h)
  }

  /** REAL decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER,
    * bottom-up, BGR, 4-byte-padded rows) — like WAV, a trivial
    * byte-level format needing no codec library. Returns None for
    * anything else (compressed, paletted, top-down, truncated);
    * callers fall back to the stub.
    */
  def decodeBmp(media: Array[Byte]): Option[ImageStats] =
    bmpPixels(media).map { case (w, h, px) => scanRows("bmp", w, h)(px) }

  /** Validated pixel accessor under [[decodeBmp]] — shared with
    * [[decodePixels]] so perceptual hashing ([[dhash64]]) reuses the
    * exact header validation instead of duplicating it.
    */
  private def bmpPixels(
      media: Array[Byte]): Option[(Int, Int, (Int, Int) => (Int, Int, Int))] = {
    def le32(o: Int) = (media(o) & 0xff) | ((media(o + 1) & 0xff) << 8) |
      ((media(o + 2) & 0xff) << 16) | ((media(o + 3) & 0xff) << 24)
    def le16(o: Int) = (media(o) & 0xff) | ((media(o + 1) & 0xff) << 8)
    if (media.length < 54 || media(0) != 'B' || media(1) != 'M') return None
    val pixOff = le32(10)
    val hdrSize = le32(14)
    val w = le32(18)
    val h = le32(22)
    if (hdrSize < 40 || w <= 0 || h <= 0 || le16(26) != 1) return None
    if (le16(28) != 24 || le32(30) != 0) return None // 24bpp, BI_RGB only
    // same pixel cap as the PNG/JPEG paths: [[dhash64]]'s overflow
    // bound (cell sum·cnt < 2⁵⁴) assumes ≤ MaxPngPixels for EVERY
    // decoder, not just the ImageIO-backed ones
    if (w.toLong * h > MaxPngPixels) return None
    // stride math in Long: a malicious header width near Int.MaxValue
    // would wrap `w * 3 + 3` negative and slip past the bounds check,
    // turning the documented None-fallback into an array crash
    val strideL = ((w.toLong * 3 + 3) / 4) * 4
    if (pixOff < 54 || pixOff.toLong + strideL * h > media.length) return None
    val stride = strideL.toInt // bounded by media.length after the check
    Some((w, h, (x: Int, y: Int) => {
      // rows are stored bottom-up; the scan is top-down like PPM so the
      // two decoders present identical (x, y) coordinates
      val o = pixOff + (h - 1 - y) * stride + x * 3
      ((media(o + 2) & 0xff), (media(o + 1) & 0xff), (media(o) & 0xff))
    }))
  }

  /** REAL decoder for binary PPM (P6, maxval 255): ASCII header
    * `P6 <w> <h> 255`, then top-down RGB triples. No comment support —
    * a `#` in the header returns None (stub fallback).
    */
  def decodePpm(media: Array[Byte]): Option[ImageStats] =
    ppmPixels(media).map { case (w, h, px) => scanRows("ppm", w, h)(px) }

  private def ppmPixels(
      media: Array[Byte]): Option[(Int, Int, (Int, Int) => (Int, Int, Int))] = {
    if (media.length < 9 || media(0) != 'P' || media(1) != '6') return None
    var off = 2
    def nextInt(): Option[Int] = {
      while (off < media.length && Character.isWhitespace(media(off))) off += 1
      val start = off
      while (off < media.length && media(off) >= '0' && media(off) <= '9') off += 1
      if (off == start || off - start > 9) None
      else Some(new String(media, start, off - start, "US-ASCII").toInt)
    }
    for {
      w <- nextInt(); h <- nextInt(); maxv <- nextInt()
      if w > 0 && h > 0 && maxv == 255
      // pixel cap mirrors bmpPixels/pngPixels — keeps dhash64's
      // documented overflow bound valid across all four formats
      if w.toLong * h <= MaxPngPixels
      if off < media.length && Character.isWhitespace(media(off))
      pixOff = off + 1 // exactly ONE whitespace byte after maxval (spec)
      if pixOff.toLong + 3L * w * h <= media.length
    } yield (w, h, (x: Int, y: Int) => {
      val o = pixOff + (y * w + x) * 3
      ((media(o) & 0xff), (media(o + 1) & 0xff), (media(o + 2) & 0xff))
    })
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

  /** REAL decoder for PNG via the JDK's built-in `javax.imageio` (part
    * of java.desktop — no external codec library). PNG is LOSSLESS, so
    * the decoded pixels equal the encoder's input bit-for-bit and the
    * integer-stat oracle technique (q57/q66) applies to a compressed
    * format exactly as to raw BMP/PPM. Returns None on parse failure
    * (truncated/corrupt stream ⇒ ImageIO yields null or throws).
    */
  // ImageIO's default cache is DISK-backed: every read/write would
  // create a temp file on the executor hot path. In-memory streams only.
  javax.imageio.ImageIO.setUseCache(false)

  /** Pixel cap enforced BEFORE ImageIO allocates the raster: a
    * 100-byte stream whose IHDR claims 20000×20000 would otherwise
    * reserve a ~1.6 GB BufferedImage (decompression bomb). 16 Mpx ≈
    * 64 MB — far above any sane asset, far below task memory.
    */
  val MaxPngPixels: Long = 16L * 1024 * 1024

  def decodePng(media: Array[Byte]): Option[ImageStats] =
    pngPixels(media).map { case (w, h, px) => scanRows("png", w, h)(px) }

  private def pngPixels(
      media: Array[Byte]): Option[(Int, Int, (Int, Int) => (Int, Int, Int))] = {
    if (media.length < 24 || !PngMagic.indices.forall(i => media(i) == PngMagic(i)))
      return None
    // IHDR is mandatory-first: width/height are big-endian at 16/20 —
    // sanity-check them from the raw bytes before ImageIO touches them
    def be32(o: Int) = ((media(o) & 0xff) << 24) | ((media(o + 1) & 0xff) << 16) |
      ((media(o + 2) & 0xff) << 8) | (media(o + 3) & 0xff)
    val (hw, hh) = (be32(16), be32(20))
    if (hw <= 0 || hh <= 0 || hw.toLong * hh > MaxPngPixels) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some((img.getWidth, img.getHeight, (x: Int, y: Int) => {
        val argb = img.getRGB(x, y)
        ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      }))
    } catch {
      // ImageIO throws IllegalArgument/IndexOutOfBounds/NegativeArraySize
      // (not just IOException) on malformed streams; the documented
      // contract is None-fallback, never a failed Spark task
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** REAL decoder for JPEG via the same JDK `javax.imageio` route as
    * [[decodePng]] — the JDK ships a JPEG reader, so the dominant
    * web-corpus image format needs no external codec either. JPEG is
    * LOSSY: unlike BMP/PPM/PNG the decoded pixels are a property of the
    * DECODER (IDCT rounding), not only of the encoder's input — so its
    * stats are pinned by a committed golden table (fixtures/
    * jpeg_golden.parquet, regenerable via `runMain graft.tools.JpegGolden`)
    * rather than replayed from a pixel formula; DIMENSIONS are exact
    * and parsed from the SOF marker below before ImageIO allocates
    * (same decompression-bomb cap as PNG). Returns None on anything
    * malformed — stub fallback, never a failed task.
    */
  def decodeJpeg(media: Array[Byte]): Option[ImageStats] =
    jpegPixels(media).map { case (w, h, px) => scanRows("jpeg", w, h)(px) }

  private def jpegPixels(
      media: Array[Byte]): Option[(Int, Int, (Int, Int) => (Int, Int, Int))] = {
    if (media.length < 4 ||
        (media(0) & 0xff) != 0xFF || (media(1) & 0xff) != 0xD8) return None
    def be16(o: Int) = ((media(o) & 0xff) << 8) | (media(o + 1) & 0xff)
    // walk the marker list to SOFn for dimensions BEFORE ImageIO touches
    // the stream (bomb cap); SOF always precedes SOS, and a corrupt
    // stream that reaches entropy-coded bytes fails the 0xFF check below
    var off = 2
    var dims: Option[(Int, Int)] = None
    while (dims.isEmpty && off + 4 <= media.length) {
      if ((media(off) & 0xff) != 0xFF) return None
      val m = media(off + 1) & 0xff
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) off += 2 // standalone markers
      else {
        val len = be16(off + 2)
        if (len < 2 || off.toLong + 2 + len > media.length) return None
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (len < 9) return None
          dims = Some((be16(off + 7), be16(off + 5))) // SOF: height first
        }
        off += 2 + len
      }
    }
    dims match {
      case Some((w, h)) if w > 0 && h > 0 && w.toLong * h <= MaxPngPixels =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
          if (img == null || img.getWidth != w || img.getHeight != h) None
          else Some((w, h, (x: Int, y: Int) => {
            val argb = img.getRGB(x, y)
            ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
          }))
        } catch {
          case scala.util.control.NonFatal(_) => None
        }
      case _ => None
    }
  }

  /** Parsed AVI container header (`avih`): geometry, declared frame
    * count, and the frame clock (microseconds per frame — the exact
    * per-frame timestamp base, `ts_micros = idx · microSecPerFrame`).
    */
  final case class AviInfo(
      width: Int, height: Int, totalFrames: Int, microSecPerFrame: Int)

  /** One decoded video frame: position among the movi video chunks,
    * compressed payload size, and the decoded pixel stats (same
    * integer-exact [[ImageStats]] contract as the still-image path).
    */
  final case class FrameStats(frameIdx: Int, byteLen: Int, stats: ImageStats)

  /** Frame-count cap parsed per asset BEFORE any frame decodes — the
    * video twin of [[MaxPngPixels]]: a forged movi list claiming
    * millions of chunks must not turn one row into an unbounded loop.
    */
  val MaxVideoFrames = 4096

  /** REAL decoder for MJPEG-in-AVI video — pure composition of two
    * parsers the engine already ships: the RIFF chunk walk (the WAV
    * container, [[decodeWav]]) and the per-frame JPEG decode
    * ([[decodeJpeg]]; `00db` raw-DIB frames holding any other supported
    * image format dispatch through [[decodeImage]] the same way). No
    * external codec: MJPEG is by definition one independent JPEG per
    * frame — there is no inter-frame state.
    *
    * Container walk: `RIFF('AVI ')` → `LIST(hdrl)` → `avih` for
    * geometry/frame-count/frame-clock, then `LIST(movi)` → every
    * `##dc`/`##db` chunk of stream 0 in file order is a frame payload.
    * `idx1` and non-video streams are skipped. All sizes are read
    * unsigned and bounds-checked against the buffer (RIFF sizes are
    * attacker-controlled); frames past [[MaxVideoFrames]] and frames
    * whose payload fails its own decoder's validation yield no entry —
    * malformed input degrades to fewer frames or None, never a crash.
    */
  def decodeAvi(media: Array[Byte]): Option[(AviInfo, Vector[FrameStats])] =
    decodeAviRaw(media).map { case (info, frames) =>
      (info, frames.flatMap { case (idx, payload) =>
        decodeImage(payload).map(FrameStats(idx, payload.length, _))
      })
    }

  /** Container walk only: parsed [[AviInfo]] + (frameIdx, payload
    * bytes) per video chunk in file order — shared by [[decodeAvi]]
    * (stats) and [[sampleVideoFrames]] (payload extraction).
    */
  def decodeAviRaw(
      media: Array[Byte]): Option[(AviInfo, Vector[(Int, Array[Byte])])] = {
    def le32(o: Int): Long = (media(o) & 0xffL) | ((media(o + 1) & 0xffL) << 8) |
      ((media(o + 2) & 0xffL) << 16) | ((media(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(media, o, 4, "US-ASCII")
    if (media.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var info: Option[AviInfo] = None
    val frames = Vector.newBuilder[(Int, Int)] // (payload offset, length)
    var nVid = 0
    // walk one chunk list in [from, until); recurse into LISTs
    def walk(from: Int, until: Int): Unit = {
      var off = from
      while (off + 8 <= until && nVid <= MaxVideoFrames) {
        val fourcc = tag(off)
        val size = le32(off + 4)
        val payload = off + 8
        if (size < 0 || payload + size > until) return // truncated: stop
        val end = payload + size.toInt
        if (fourcc == "LIST" && size >= 4) {
          walk(payload + 4, end) // list type at payload, children after
        } else if (fourcc == "avih" && size >= 40 && info.isEmpty) {
          val w = le32(payload + 32); val h = le32(payload + 36)
          val tf = le32(payload + 16); val uspf = le32(payload)
          if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
              w * h > MaxPngPixels) return
          info = Some(AviInfo(w.toInt, h.toInt, tf.toInt, uspf.toInt))
        } else if (fourcc.length == 4 &&
            fourcc(0) == '0' && fourcc(1) == '0' &&
            (fourcc.substring(2) == "dc" || fourcc.substring(2) == "db")) {
          if (nVid < MaxVideoFrames) frames += ((payload, size.toInt))
          nVid += 1
        }
        off = end + (size.toInt & 1) // RIFF chunks pad to even
      }
    }
    walk(12, media.length)
    info.map { i =>
      (i, frames.result().zipWithIndex.map { case ((o, len), idx) =>
        (idx, java.util.Arrays.copyOfRange(media, o, o + len))
      })
    }
  }

  /** Fixture/test encoder: minimal MJPEG-in-AVI from pre-encoded frame
    * payloads (normally [[encodeJpeg]] output), inverse of
    * [[decodeAvi]]. Writes RIFF(AVI ) → LIST(hdrl){avih,
    * LIST(strl){strh,strf}} → LIST(movi){00dc...}; no idx1 (optional in
    * the spec, ignored by the parser).
    */
  def encodeAvi(
      w: Int, h: Int, microSecPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum + 4
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    tag("RIFF"); le32(riffBody); tag("AVI ")
    tag("LIST"); le32(hdrlBody); tag("hdrl")
    tag("avih"); le32(56)
    le32(microSecPerFrame); le32(0); le32(0); le32(0)
    le32(frames.size); le32(0); le32(1); le32(0)
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("MJPG")
    le32(0); le32(0); le32(0)
    le32(microSecPerFrame); le32(1000000) // dwScale/dwRate = frame clock
    le32(0); le32(frames.size); le32(0); le32(-1); le32(0)
    le32(0); le32(0) // rcFrame
    tag("strf"); le32(40)
    le32(40); le32(w); le32(h); out.write(1); out.write(0)
    out.write(24); out.write(0); tag("MJPG")
    le32(0); le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(moviBody); tag("movi")
    frames.foreach { f =>
      tag("00dc"); le32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0) // even padding
    }
    out.toByteArray
  }

  /** Video decode + per-frame stat extraction, one batched narrow pass
    * per partition — the video twin of [[imageStats]]: one output row
    * per DECODED frame with the container clock's exact timestamp.
    * Assets that are not a parseable AVI yield no rows.
    */
  def videoFrameStats(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val media = if (a.media == null) Array.emptyByteArray else a.media
        decodeAvi(media).toSeq.flatMap { case (info, fs) =>
          fs.map { f =>
            (a.asset_id, f.frameIdx,
              f.frameIdx.toLong * info.microSecPerFrame,
              f.stats.format, f.stats.width, f.stats.height,
              f.byteLen.toLong, fs.size, info.totalFrames,
              f.stats.lumaSum, f.stats.nPixels, f.stats.edgeCount,
              f.stats.hPairs)
          }
        }
      }
    }.toDF("asset_id", "frame_idx", "ts_micros", "format", "width",
      "height", "frame_bytes", "n_decoded", "n_declared",
      "luma_sum", "n_pixels", "edge_count", "h_pairs")
  }

  /** REAL frame extraction for batch inference — the decoded-video twin
    * of [[sampleFrames]] (which slices the raw byte stream at a fixed
    * stride for stub/unknown media): every `stride`-th VIDEO FRAME
    * payload from the AVI container, up to `maxFrames`, with the
    * container clock's exact timestamp — (asset_id, frame_idx,
    * ts_micros, payload) is the batch shape a vision model's inference
    * stage consumes (each payload is a standalone JPEG — MJPEG has no
    * inter-frame state, so any downstream decoder works per-row).
    * Narrow mapPartitions, no shuffle; non-AVI assets yield no rows.
    */
  def sampleVideoFrames(
      assets: Dataset[MediaAsset],
      stride: Int = 1,
      maxFrames: Int = MaxVideoFrames): DataFrame = {
    require(stride >= 1 && maxFrames >= 1, "positive stride/cap")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val media = if (a.media == null) Array.emptyByteArray else a.media
        framePayloads(media).toSeq.flatMap { case (info, frames) =>
          frames.iterator.zipWithIndex
            .filter { case (_, idx) => idx % stride == 0 }
            .take(maxFrames)
            .map { case ((fIdx, payload), _) =>
              (a.asset_id, fIdx, fIdx.toLong * info.microSecPerFrame,
                payload)
            }
        }
      }
    }.toDF("asset_id", "frame_idx", "ts_micros", "payload")
  }

  /** Raw (idx, payload) frame list from an AVI — the container walk of
    * [[decodeAvi]] WITHOUT decoding the frames (payload extraction must
    * not pay for pixel stats the consumer's own decoder will redo).
    */
  def framePayloads(
      media: Array[Byte]): Option[(AviInfo, Vector[(Int, Array[Byte])])] =
    decodeAviRaw(media)

  /** Image dispatch on magic bytes: BMP, PPM, PNG, JPEG, else None. */
  def decodeImage(media: Array[Byte]): Option[ImageStats] =
    if (media.length >= 2 && media(0) == 'B' && media(1) == 'M') decodeBmp(media)
    else if (media.length >= 2 && media(0) == 'P' && media(1) == '6') decodePpm(media)
    else if (media.length >= 4 && media(0) == PngMagic(0) && media(1) == 'P') decodePng(media)
    else if (media.length >= 3 && (media(0) & 0xff) == 0xFF &&
      (media(1) & 0xff) == 0xD8) decodeJpeg(media)
    else None

  /** Validated pixel accessor with the same magic-byte dispatch (and the
    * same bomb caps / None-fallbacks) as [[decodeImage]] — for consumers
    * that need the pixels themselves rather than the reduced stats
    * ([[dhash64]]).
    */
  def decodePixels(
      media: Array[Byte]): Option[(Int, Int, (Int, Int) => (Int, Int, Int))] =
    if (media.length >= 2 && media(0) == 'B' && media(1) == 'M') bmpPixels(media)
    else if (media.length >= 2 && media(0) == 'P' && media(1) == '6') ppmPixels(media)
    else if (media.length >= 4 && media(0) == PngMagic(0) && media(1) == 'P') pngPixels(media)
    else if (media.length >= 3 && (media(0) & 0xff) == 0xFF &&
      (media(1) & 0xff) == 0xD8) jpegPixels(media)
    else None

  /** 64-bit difference hash (dHash) over the decoded luma plane — the
    * PERCEPTUAL image fingerprint (q241): the image is reduced to a 9×8
    * grid of integer scaled-luma cell sums (pixel x lands in grid
    * column x·9/w, y in row y·8/h — every cell non-empty for w ≥ 9,
    * h ≥ 8), and bit (row·8 + col) is set iff the MEAN luma of cell
    * (col+1, row) exceeds cell (col, row)'s. Means are compared by
    * cross-multiplied integer sums (sum_r·cnt_l > sum_l·cnt_r) — exact,
    * no division rounding; overflow-safe because a cell holds at most
    * ~([[MaxPngPixels]]/72)·1.1 pixels, keeping sum·cnt < 2⁵⁴.
    *
    * Perceptual property: re-encoding (a different JPEG quality factor,
    * a lossless↔lossy format hop) perturbs individual pixels but not
    * the ORDERING of coarse-cell means, so re-encoded copies land
    * within a small Hamming distance of each other — which exact
    * decoded-content signatures (q237/q240) by design cannot catch.
    * None for undecodable media or images smaller than the grid.
    */
  def dhash64(media: Array[Byte]): Option[Long] =
    decodePixels(media).collect { case (w, h, px) if w >= 9 && h >= 8 =>
      val sums = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val (r, g, b) = px(x, y)
          sums(cy)(x * 9 / w) += lumaInt(r, g, b)
          cnts(cy)(x * 9 / w) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          if (sums(cy)(cx + 1) * cnts(cy)(cx) > sums(cy)(cx) * cnts(cy)(cx + 1))
            hash |= 1L << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
      hash
    }

  /** Fixture/test encoder: uncompressed 24-bit bottom-up BMP from a
    * pixel function (x, y) → (r, g, b), inverse of [[decodeBmp]].
    */
  def encodeBmp(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, h)
    out(26) = 1; out(28) = 24 // planes=1, bpp=24, compression=0 (zeroed)
    le32(34, stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        val o = 54 + (h - 1 - y) * stride + x * 3
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Fixture/test encoder: binary P6 PPM, inverse of [[decodePpm]]. */
  def encodePpm(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        val o = header.length + (y * w + x) * 3
        out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Fixture/test encoder: PNG from a pixel function via the JDK
    * ImageIO writer. The byte STREAM may differ across JDK encoder
    * versions, but PNG is lossless so the decoded pixels — all any
    * consumer sees — are exactly `rgb`'s values.
    */
  def encodePng(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Fixture/test encoder: JPEG from a pixel function via the JDK
    * ImageIO writer at an explicit quality. Lossy BOTH ways: the bytes
    * depend on the encoder version AND the decoded pixels depend on the
    * decoder — which is exactly why the q87 oracle pins decoded stats
    * with a committed golden table instead of a formula replay.
    */
  def encodeJpeg(
      w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int),
      quality: Float = 0.9f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Decode + image-stat extraction, one batched narrow pass per
    * partition — the image twin of [[extractFeatures]]. Assets that are
    * not a decodable BMP/PPM/PNG/JPEG yield no row (callers needing a
    * fallback use [[extractFeatures]], whose stub path covers any
    * bytes).
    */
  def imageStats(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val media = if (a.media == null) Array.emptyByteArray else a.media
        decodeImage(media).map(s =>
          (a.asset_id, s.format, s.width, s.height,
            s.lumaSum, s.nPixels, s.edgeCount, s.hPairs))
      }
    }.toDF("asset_id", "format", "width", "height",
      "luma_sum", "n_pixels", "edge_count", "h_pairs")
  }

  /** Format dispatch: real WAV/AVI/BMP/PPM/PNG/JPEG parse when magic
    * bytes match (each parser returns None on anything malformed, so a
    * text blob that merely begins with a magic pair still falls back),
    * deterministic unknown-format fallback otherwise. Image features:
    * [w, h, mean luma, edge density, 3 channels, 0, 0, 0]; nFrames = 1.
    * Video features: [w, h, mean luma over decoded frames, mean edge
    * density, 3, µs/frame ÷ 1000, 0, 0]; nFrames = decoded count.
    */
  def decode(media: Array[Byte]): (Int, Array[Float]) =
    (if (media.length >= 12 && media(0) == 'R' && media(1) == 'I' &&
         media(2) == 'F' && media(3) == 'F')
       decodeWav(media).map { case (info, feats) => (info.nFrames, feats) }
         .orElse(decodeAvi(media).collect {
           case (info, fs) if fs.nonEmpty =>
             val luma = fs.map(f =>
               f.stats.lumaSum.toDouble / (255000.0 * f.stats.nPixels)).sum / fs.size
             val edges = fs.map(f => if (f.stats.hPairs == 0) 0.0
               else f.stats.edgeCount.toDouble / f.stats.hPairs).sum / fs.size
             (fs.size, Array[Float](info.width.toFloat, info.height.toFloat,
               luma.toFloat, edges.toFloat, 3f,
               info.microSecPerFrame / 1000.0f, 0f, 0f))
         })
     else decodeImage(media).map { s =>
       val meanLuma = s.lumaSum.toDouble / (255000.0 * s.nPixels)
       val edgeDensity =
         if (s.hPairs == 0) 0.0 else s.edgeCount.toDouble / s.hPairs
       (1, Array[Float](s.width.toFloat, s.height.toFloat, meanLuma.toFloat,
         edgeDensity.toFloat, 3f, 0f, 0f, 0f))
     }).getOrElse(decodeStub(media))

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
