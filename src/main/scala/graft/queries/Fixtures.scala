package graft

import graft.operators.Multimodal

/** Deterministic synthesized-media fixture builders shared by the
  * multimodal queries (q57/q66/q87/q191/q231), their DuckDB oracles,
  * the golden-table tools, and the scale probe.
  *
  * A TOP-LEVEL object on purpose: these run INSIDE Dataset closures
  * (`.map(Fixtures.imageAssetFor _)`), and a static module call
  * serializes as nothing — whereas the same method mixed into the
  * [[Queries]] object via a trait makes every eta-expansion capture
  * `this` and drags the (non-serializable) registry into the task
  * closure. Found the hard way when the Queries split broke q57.
  */
object Fixtures {

  /** Shared synthesized-image geometry + pixel formula for doc `id` —
    * the single source the q57/q66 oracles replay; the 10× scale probe
    * reuses it so the probed geometry is exactly the certified one. */
  private[graft] def imageGeom(id: Long): (Int, Int, (Int, Int) => (Int, Int, Int)) = {
    val w = (8 + id % 8).toInt
    val h = (8 + id % 5).toInt
    def px(x: Int, y: Int) = (
      ((id * 7 + x * 3 + y * 5) % 256).toInt,
      ((id * 11 + x * 13 + y) % 256).toInt,
      ((id + x + y * 17) % 256).toInt)
    (w, h, px)
  }

  private[graft] def imageAssetFor(id: Long): Multimodal.MediaAsset = {
    val (w, h, px) = imageGeom(id)
    Multimodal.MediaAsset(id, "image",
      if (id % 2 == 0) Multimodal.encodeBmp(w, h, px)
      else Multimodal.encodePpm(w, h, px))
  }

  /** Same geometry/pixels, compressed through the PNG encoder — PNG is
    * lossless, so the decoded stats equal the raw-format ones and the
    * identical formula oracle applies (q66). */
  private[graft] def pngAssetFor(id: Long): Multimodal.MediaAsset = {
    val (w, h, px) = imageGeom(id)
    Multimodal.MediaAsset(id, "image", Multimodal.encodePng(w, h, px))
  }

  /** Same geometry/pixels through the LOSSY JPEG encoder at a fixed
    * quality. Everything about the pixel VALUES is decoder-dependent
    * after this, so q87's oracle pins them via the committed golden
    * table instead of the formula ([[graft.tools.JpegGolden]]); the
    * geometry period is lcm(256, 40) = 1280 (pixel formula reduces mod
    * 256, w/h mod 8/5), so golden row `doc_id % 1280` covers every doc
    * id at every scale factor.
    */
  private[graft] val JpegQuality = 0.9f
  private[graft] val JpegGeomPeriod = 1280L
  private[graft] def jpegAssetFor(id: Long): Multimodal.MediaAsset = {
    val (w, h, px) = imageGeom(id)
    Multimodal.MediaAsset(id, "image", Multimodal.encodeJpeg(w, h, px, JpegQuality))
  }

  /** Deterministic MJPEG-in-AVI fixture: `2 + doc_id % 4` frames at the
    * q57 geometry, each frame's pixels the q57 formula shifted by a
    * frame salt, JPEG-encoded at [[JpegQuality]] and wrapped by
    * [[Multimodal.encodeAvi]] at exactly 25 fps (40 000 µs/frame).
    * Period: pixels reduce mod 256, w/h mod 8/5, frame count mod 4, and
    * 4 divides lcm(256·5·8) = 1280 — so golden row `doc_id % 1280`
    * covers every doc id at every scale factor, like q87's.
    */
  private[graft] val VideoGeomPeriod = 1280L
  private[graft] val VideoMicroSecPerFrame = 40000
  private[graft] def videoNFrames(id: Long): Int = (2 + id % 4).toInt
  private[graft] def videoFramePx(id: Long, f: Int)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 7 + f * 19 + x * 3 + y * 5) % 256).toInt,
    ((id * 11 + f * 23 + x * 13 + y) % 256).toInt,
    ((id + f * 29 + x + y * 17) % 256).toInt)
  private[graft] def videoAssetFor(id: Long): Multimodal.MediaAsset = {
    val (w, h, _) = imageGeom(id)
    val frames = (0 until videoNFrames(id)).map(f =>
      Multimodal.encodeJpeg(w, h, videoFramePx(id, f), JpegQuality))
    Multimodal.MediaAsset(id, "video",
      Multimodal.encodeAvi(w, h, VideoMicroSecPerFrame, frames))
  }
  private[graft] def wavAssetFor(id: Long): Multimodal.MediaAsset = {
    val n = (64 + id % 32).toInt
    val samples = Array.tabulate(n)(t =>
      (((id * 31 + 7L * t * t) % 4096) - 2048).toInt)
    Multimodal.MediaAsset(id, "audio", Multimodal.encodeWav(8000, samples))
  }

  /** Perceptual image-dedup fixture (q241): [[DhashClasses]] image
    * classes, each a 36×32 grayscale block pattern with STRICT
    * inequality between horizontally adjacent cells (value step ≥ 20
    * luma units — far above JPEG quantization noise, so a re-encode
    * cannot flip a dHash comparison), re-encoded at TWO JPEG qualities:
    * variant 0 = 0.9, variant 1 = 0.5. Same pixels in, different bytes
    * AND different decoded pixels out (lossy) — the planted "re-encoded
    * copy" that exact decoded-content signatures (q237/q240) cannot
    * group but [[Multimodal.dhash64]] can. The 36×32 geometry makes
    * every dHash grid cell exactly 4×4 pixels, so each pattern cell
    * IS a grid cell.
    *
    * Pattern: cell k (row-major over the 9×8 grid) has gray value
    * 30 + 20·((k·s + t) mod 11) with s = gid%10 + 1, t = gid/10 —
    * s ∈ 1..10 is never ≡ 0 (mod 11), so adjacent cells always differ,
    * and the per-row phase (9s + t) mod 11 shifts every row. 110
    * distinct (s, t) classes.
    */
  private[graft] val DhashClasses = 110L
  private[graft] val DhashQualities = Array(0.9f, 0.5f)
  private[graft] def dhashPattern(gid: Long)(x: Int, y: Int): (Int, Int, Int) = {
    val s = (gid % 10 + 1).toInt
    val tt = (gid / 10).toInt
    val k = (y / 4) * 9 + (x / 4)
    val v = 30 + 20 * ((k * s + tt) % 11)
    (v, v, v)
  }
  private[graft] def dhashMedia(gid: Long, variant: Int): Array[Byte] =
    Multimodal.encodeJpeg(36, 32, dhashPattern(gid), DhashQualities(variant))
  private[graft] def dhashAssetFor(id: Long): Multimodal.MediaAsset = {
    val gid = id % DhashClasses
    val variant = ((id / DhashClasses) % 2).toInt
    Multimodal.MediaAsset(id, "image", dhashMedia(gid, variant))
  }

  /** Amplitude-scaled audio fixture (q242): [[AudioEnvClasses]] clip
    * classes on the [[wavAssetFor]] sample formula, each planted at
    * THREE amplitudes (×1, ×2, ×3 — integer-exact, |s| ≤ 3·2048 well
    * inside int16). A scaled copy has different samples, a different
    * (n, Σs, Σs²) exact signature (q240 splits it), but the SAME
    * energy-envelope shape — the invariance q242's quantized envelope
    * signature exploits.
    */
  /** Cross-FORMAT image-identity fixture (q244): the [[dhashPattern]]
    * classes again, but each planted in FOUR container formats — BMP,
    * PPM, PNG (lossless: identical decoded pixels, wildly different
    * bytes) and JPEG 0.9 (lossy: different decoded pixels too). A
    * byte-hash splits all four; an exact decoded-pixel signature still
    * splits JPEG from the rest; the dHash collapses all four (the
    * lossless trio trivially, JPEG by the ≥ 20-luma-unit margin that
    * q241 pins). Because every cell of the pattern is CONSTANT within
    * its 4×4 dHash grid cell, the hash has a closed integer form —
    * bit (cy·8+cx) = [pattern(cx+1, cy) > pattern(cx, cy)] — which the
    * oracle replays directly: no golden table, even though one format
    * is lossy.
    */
  private[graft] def formatMedia(gid: Long, fmt: Int): Array[Byte] = fmt match {
    case 0 => Multimodal.encodeBmp(36, 32, dhashPattern(gid))
    case 1 => Multimodal.encodePpm(36, 32, dhashPattern(gid))
    case 2 => Multimodal.encodePng(36, 32, dhashPattern(gid))
    case _ => Multimodal.encodeJpeg(36, 32, dhashPattern(gid), 0.9f)
  }
  private[graft] def formatAssetFor(id: Long): Multimodal.MediaAsset = {
    val gid = id % DhashClasses
    val fmt = ((id / DhashClasses) % 4).toInt
    Multimodal.MediaAsset(id, "image", formatMedia(gid, fmt))
  }

  /** Perceptual video-dedup fixture (q243): [[VideoPerceptClasses]]
    * clip classes, each an MJPEG AVI of 2–4 36×32 frames drawn from the
    * [[dhashPattern]] family (frame f of class gid uses pattern class
    * (gid + 37·f) mod [[DhashClasses]] — the same ≥ 20-luma-unit cell
    * steps that make the dHash re-encode-proof), re-encoded at the two
    * [[DhashQualities]] JPEG qualities. The two variants of a class are
    * different bytes AND different decoded frame pixels (lossy), so
    * q237's exact frame-stat signature splits them — but every frame's
    * dHash is identical across variants, so the q243 per-frame dHash
    * SEQUENCE collapses them. Classes are sequence-distinct: two
    * classes share all pattern indices only when gid₁ ≡ gid₂
    * (mod [[DhashClasses]]), and those pairs differ in frame COUNT
    * (n = 2 + gid mod 3 shifts by 2 between gid and gid+110).
    */
  private[graft] val VideoPerceptClasses = 120L
  private[graft] def videoPerceptMedia(gid: Long, variant: Int): Array[Byte] = {
    val n = (2 + gid % 3).toInt
    val frames = (0 until n).map(f => Multimodal.encodeJpeg(36, 32,
      dhashPattern((gid + 37L * f) % DhashClasses), DhashQualities(variant)))
    Multimodal.encodeAvi(36, 32, VideoMicroSecPerFrame, frames)
  }
  private[graft] def videoPerceptAssetFor(id: Long): Multimodal.MediaAsset = {
    val gid = id % VideoPerceptClasses
    val variant = ((id / VideoPerceptClasses) % 2).toInt
    Multimodal.MediaAsset(id, "video", videoPerceptMedia(gid, variant))
  }

  private[graft] val AudioEnvClasses = 150L
  private[graft] def wavScaledAssetFor(id: Long): Multimodal.MediaAsset = {
    val gid = id % AudioEnvClasses
    val amp = ((id / AudioEnvClasses) % 3 + 1).toInt
    val n = (64 + gid % 32).toInt
    val samples = Array.tabulate(n)(t =>
      amp * (((gid * 31 + 7L * t * t) % 4096) - 2048).toInt)
    Multimodal.MediaAsset(id, "audio", Multimodal.encodeWav(8000, samples))
  }

  /** Cross-SAMPLE-RATE audio fixture (q246): [[AudioRateClasses]] clip
    * classes, each planted at 8/16/32 kHz as zero-order-hold re-encodes
    * of the same base clip (every base sample repeated r = 1/2/4 times,
    * sample-rate header scaled to match — same audible content, same
    * duration, r× the samples). The base length n₀ = 64 + 8·(gid mod 5)
    * is a MULTIPLE of the 8 envelope windows, so window boundaries of
    * the upsampled stream fall on multiples of r·n₀/8 and a
    * repeat-group of r copies is never split across windows: per-window
    * energy scales by exactly r, the clip total by the same r, and the
    * ⌊E_w·scale/ΣE⌋ quantization takes the floor of the SAME rational —
    * re-encodes collide EXACTLY (the rate analog of q242's amplitude
    * c² cancellation), while n_samples, sample_rate, and the raw bytes
    * all differ. The sample formula (37·gid + 11·t²) is deliberately
    * distinct from [[wavScaledAssetFor]]'s so the two fixture families
    * never cross-collide in shared scratch comparisons.
    */
  private[graft] val AudioRateClasses = 150L
  private[graft] def wavRateAssetFor(id: Long): Multimodal.MediaAsset = {
    val gid = id % AudioRateClasses
    val r = 1 << ((id / AudioRateClasses) % 3).toInt // 1, 2, 4
    val n0 = (64 + 8 * (gid % 5)).toInt
    val base = Array.tabulate(n0)(t =>
      (((gid * 37 + 11L * t * t) % 4096) - 2048).toInt)
    val samples = Array.tabulate(n0 * r)(j => base(j / r))
    Multimodal.MediaAsset(id, "audio",
      Multimodal.encodeWav(8000 * r, samples))
  }
}
