package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaAsset

/** Multimodal binary-column plumbing: schema contract, deterministic
  * stub decode, frame sampling shape (SURVEY §3.3).
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def asset(id: Long, size: Int): MediaAsset =
    MediaAsset(id, "image", Array.tabulate(size)(i => (i % 251).toByte))

  test("extractFeatures: typed schema, stable hash, frame count from bytes") {
    val ds = Seq(asset(1L, 1000), asset(2L, 10), asset(3L, 0)).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.asset_id)
    assert(out.map(_.byte_len).toSeq == Seq(1000L, 10L, 0L))
    assert(out.map(_.n_frames).toSeq == Seq(4, 1, 1)) // ceil(1000/256)=4
    assert(out.forall(_.features.length == Multimodal.FeatureDim))
    assert(out(0).content_hash.length == 32)

    // deterministic: same bytes -> same hash and features
    val again = Multimodal.extractFeatures(ds).collect().sortBy(_.asset_id)
    assert(again.map(_.content_hash).toSeq == out.map(_.content_hash).toSeq)
    assert(again(0).features.toSeq == out(0).features.toSeq)
  }

  test("sampleFrames: stride + cap, frame bytes sliced at the right offsets") {
    val ds = Seq(asset(7L, 1000)).toDS()
    val frames = Multimodal.sampleFrames(ds, stride = 2, maxFrames = 10)
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(frames.map(_._2).toSeq == Seq(0, 2)) // frames 0..3, stride 2
    assert(frames(0)._3.length == Multimodal.FrameBytes)
    assert(frames(1)._3.head == asset(7L, 1000).media(2 * Multimodal.FrameBytes))
  }

  /** Minimal 16-bit PCM mono WAV built byte-by-byte in the test. */
  private def sineWav(rateHz: Int, freqHz: Double, seconds: Double,
      amplitude: Double): Array[Byte] = {
    val nFrames = (rateHz * seconds).toInt
    val dataLen = nFrames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rateHz).putInt(rateHz * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until nFrames).foreach { i =>
      val s = amplitude * math.sin(2 * math.Pi * freqHz * i / rateHz)
      bb.putShort((s * 32767).toShort)
    }
    bb.array()
  }

  test("decodeWav: real PCM parse recovers duration, RMS, peak, ZCR") {
    val wav = sineWav(rateHz = 8000, freqHz = 440, seconds = 0.5, amplitude = 0.5)
    val Some((info, feats)) = Multimodal.decodeWav(wav)
    assert(info == Multimodal.WavInfo(8000, 1, 16, 4000))
    assert(math.abs(feats(0) - 0.5f) < 1e-6, s"duration ${feats(0)}")
    assert(math.abs(feats(1) - 0.5 / math.sqrt(2)) < 0.01, s"rms ${feats(1)}")
    assert(math.abs(feats(2) - 0.5) < 0.01, s"peak ${feats(2)}")
    // sine crosses zero 2f times per second: zcr ~ 2*440/8000
    assert(math.abs(feats(3) - 0.11) < 0.01, s"zcr ${feats(3)}")

    // and through the distributed pipeline: RIFF magic dispatches to the
    // real decoder, frame count = sample frames, not byte-stride frames
    val out = Multimodal.extractFeatures(
      Seq(MediaAsset(1L, "audio", wav)).toDS()).collect().head
    assert(out.n_frames == 4000)
    assert(out.features.toSeq == feats.toSeq)
  }

  test("decodeWav rejects malformed/compressed input; stub takes over") {
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty) // truncated
    val nonPcm = sineWav(8000, 440, 0.1, 0.5)
    nonPcm(20) = 2 // audioFormat = 2 (ADPCM) -> not PCM
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
    val out = Multimodal.extractFeatures(
      Seq(MediaAsset(2L, "audio", nonPcm)).toDS()).collect().head
    assert(out.n_frames == (nonPcm.length + 255) / 256) // stub fallback
  }

  test("decodeBmp/decodePpm: encode-decode round trip with exact stats") {
    // vertical stripes: luma alternates 0 / 255000-scaled white per column
    def stripes(x: Int, y: Int) = if (x % 2 == 0) (0, 0, 0) else (255, 255, 255)
    for ((enc, fmt) <- Seq(
        (Multimodal.encodeBmp _, "bmp"), (Multimodal.encodePpm _, "ppm"))) {
      val bytes = enc(5, 4, stripes)
      val Some(s) = Multimodal.decodeImage(bytes)
      assert(s.format == fmt)
      assert((s.width, s.height) == (5, 4))
      assert(s.nPixels == 20 && s.hPairs == 16)
      // 2 white columns of 4 = 8 white pixels at scaled luma 255000
      assert(s.lumaSum == 8L * 255000)
      assert(s.edgeCount == 16) // every horizontal neighbor pair is an edge
    }
    // flat image: zero edges, exact mean
    val flat = Multimodal.encodeBmp(3, 3, (_, _) => (10, 20, 30))
    val Some(f) = Multimodal.decodeImage(flat)
    assert(f.edgeCount == 0)
    assert(f.lumaSum == 9L * (299 * 10 + 587 * 20 + 114 * 30))
  }

  test("bmp and ppm decoders agree pixel-for-pixel on the same image") {
    def px(x: Int, y: Int) = ((x * 37 + y * 11) % 256, (x + y * 71) % 256, (x * 5) % 256)
    val Some(a) = Multimodal.decodeImage(Multimodal.encodeBmp(7, 6, px))
    val Some(b) = Multimodal.decodeImage(Multimodal.encodePpm(7, 6, px))
    // BMP stores bottom-up BGR with padded rows, PPM top-down RGB — the
    // decoders must normalize both to identical (x, y) stats
    assert(a.copy(format = "x") == b.copy(format = "x"))
  }

  test("malformed image bytes fall back to the stub, never crash") {
    val cases = Seq[Array[Byte]](
      "BM".getBytes, // truncated header
      "P6\n5 4\n254\n".getBytes ++ Array.fill(60)(1.toByte), // maxval != 255
      "P6\n5 4\n255\n".getBytes ++ Array.fill(10)(1.toByte), // short pixel data
      { val b = Multimodal.encodeBmp(4, 4, (_, _) => (1, 2, 3))
        b(28) = 8; b }, // 8bpp paletted
      "BMlooks like text but is not a bitmap at all...".getBytes)
    cases.foreach { c =>
      assert(Multimodal.decodeImage(c).isEmpty)
      val out = Multimodal.extractFeatures(
        Seq(MediaAsset(9L, "image", c)).toDS()).collect().head
      assert(out.n_frames == math.max(1, (c.length + 255) / 256)) // stub
    }
  }

  test("imageStats: distributed narrow pass over mixed-format assets") {
    def px(x: Int, y: Int) = ((x * 31) % 256, (y * 17) % 256, ((x + y) * 3) % 256)
    val ds = Seq(
      MediaAsset(1L, "image", Multimodal.encodeBmp(6, 5, px)),
      MediaAsset(2L, "image", Multimodal.encodePpm(6, 5, px)),
      MediaAsset(3L, "image", "not an image".getBytes)).toDS()
    val rows = Multimodal.imageStats(ds).collect().sortBy(_.getLong(0))
    assert(rows.length == 2) // undecodable asset yields no row
    assert(rows(0).getString(1) == "bmp" && rows(1).getString(1) == "ppm")
    assert(rows(0).getLong(4) == rows(1).getLong(4)) // same luma_sum
  }

  test("png decode is lossless: stats equal the raw-format decoders'") {
    def px(x: Int, y: Int) = ((x * 37 + y * 11) % 256, (x + y * 71) % 256, (x * 5) % 256)
    val Some(p) = Multimodal.decodeImage(Multimodal.encodePng(7, 6, px))
    val Some(b) = Multimodal.decodeImage(Multimodal.encodeBmp(7, 6, px))
    assert(p.format == "png")
    // the zlib round trip must not move a single pixel
    assert(p.copy(format = "x") == b.copy(format = "x"))
  }

  test("corrupt png falls back to the stub, never crashes") {
    val good = Multimodal.encodePng(5, 5, (_, _) => (1, 2, 3))
    val cases = Seq[Array[Byte]](
      good.take(8), // magic only
      good.take(good.length / 2), // truncated mid-IDAT
      { val c = good.clone(); c(good.length / 2) = 0x55; c(good.length / 2 + 1) = 0xAA.toByte; c })
    cases.foreach { c =>
      // truncated/corrupted streams must never escape as an exception;
      // a damaged-but-parseable stream may still decode (CRCs are
      // advisory to ImageIO) — what matters is the no-crash contract
      val r = try Multimodal.decodeImage(c) catch {
        case e: Throwable => fail(s"decodePng threw ${e.getClass.getName}")
      }
      r.foreach(s => assert(s.format == "png"))
    }
    assert(Multimodal.decodeImage(good.take(8)).isEmpty)
    // decompression bomb: a tiny stream whose IHDR claims 20000x20000
    // must be rejected from the HEADER, before ImageIO allocates rasters
    val bomb = good.clone()
    def be32(o: Int, v: Int): Unit = {
      bomb(o) = (v >>> 24).toByte; bomb(o + 1) = (v >>> 16).toByte
      bomb(o + 2) = (v >>> 8).toByte; bomb(o + 3) = v.toByte
    }
    be32(16, 20000); be32(20, 20000)
    assert(Multimodal.decodeImage(bomb).isEmpty, "bomb header must be rejected")
  }

  test("jpeg decode: exact dimensions from SOF, plausible lossy pixel stats") {
    def px(x: Int, y: Int) = ((x * 37 + y * 11) % 256, (x + y * 71) % 256, (x * 5) % 256)
    val bytes = Multimodal.encodeJpeg(9, 7, px, quality = 0.9f)
    val Some(j) = Multimodal.decodeImage(bytes)
    assert(j.format == "jpeg" && j.width == 9 && j.height == 7)
    assert(j.nPixels == 63 && j.hPairs == 56)
    // lossy but REAL: mean luma must land near the lossless truth (the
    // stub, by contrast, produces no ImageStats at all — reaching here
    // proves the codec path ran; the tolerance bounds IDCT error)
    val Some(truth) = Multimodal.decodeImage(Multimodal.encodeBmp(9, 7, px))
    val meanJ = j.lumaSum.toDouble / (255000.0 * j.nPixels)
    val meanT = truth.lumaSum.toDouble / (255000.0 * truth.nPixels)
    assert(math.abs(meanJ - meanT) < 0.05,
      s"decoded mean luma $meanJ too far from lossless $meanT")
    // determinism within one JVM: same bytes, same stats (the q87
    // golden-pin contract)
    assert(Multimodal.decodeImage(bytes) == Some(j))
  }

  test("corrupt jpeg falls back to None/stub, never crashes; bomb header rejected") {
    val good = Multimodal.encodeJpeg(6, 5, (_, _) => (9, 9, 9))
    Seq[Array[Byte]](
      good.take(2), // bare SOI
      good.take(good.length / 2), // truncated mid-entropy
      { val c = good.clone(); c(c.length / 3) = 0x55; c }).foreach { c =>
      val r = try Multimodal.decodeImage(c) catch {
        case e: Throwable => fail(s"decodeJpeg threw ${e.getClass.getName}")
      }
      r.foreach(s => assert(s.format == "jpeg"))
    }
    // decompression bomb: rewrite the SOF dims to 20000x20000 — must be
    // rejected from the marker walk, before ImageIO allocates a raster
    val bomb = good.clone()
    var off = 2
    var sof = -1
    while (sof < 0 && off + 4 <= bomb.length) {
      val m = bomb(off + 1) & 0xff
      val len = ((bomb(off + 2) & 0xff) << 8) | (bomb(off + 3) & 0xff)
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) sof = off
      else off += 2 + len
    }
    assert(sof > 0, "fixture jpeg must contain a SOF marker")
    bomb(sof + 5) = 0x4E; bomb(sof + 6) = 0x20 // height 20000
    bomb(sof + 7) = 0x4E; bomb(sof + 8) = 0x20 // width 20000
    assert(Multimodal.decodeJpeg(bomb).isEmpty)
  }

  test("documentFeatures wires the documents table shape end-to-end") {
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.documentFeatures(spark, docs).collect().sortBy(_.asset_id)
    assert(out(0).byte_len == 11L)
    assert(out(0).content_hash.length == 32)
    assert(out(1).byte_len == 0L)
  }

  test("encodeWav/decodeWavSamples round-trip; decodeWav agrees") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 7)
    val wav = Multimodal.encodeWav(8000, samples)
    val Some((info, got)) = Multimodal.decodeWavSamples(wav)
    assert(info == Multimodal.WavInfo(8000, 1, 16, 6))
    assert(got.toSeq == samples.toSeq, got.mkString(","))
    // the float-feature decoder parses the same bytes
    val Some((info2, _)) = Multimodal.decodeWav(wav)
    assert(info2 == info)
    // malformed input stays None, never crashes
    assert(Multimodal.decodeWavSamples("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeWavSamples(wav.take(30)).isEmpty)
  }

  test("audioPeriodicity: exact autocorrelation, periodic best lag") {
    // strict period 4 (n=16): R(4) sums perfectly aligned squares, so
    // lag 4 must win; hand-check R(0) = 4 * (0+100^2+(-100)^2+50^2)
    val period = Array(0, 100, -100, 50)
    val s = Array.tabulate(16)(t => period(t % 4))
    val wav = Multimodal.encodeWav(8000, s)
    val r = Multimodal.audioPeriodicity(
      Seq(MediaAsset(9L, "audio", wav)).toDS(), 1, 6).collect().head
    assert(r.getAs[Long]("n_samples") == 16L)
    assert(r.getAs[Long]("best_lag") == 4L)
    assert(r.getAs[Long]("r0") == 4L * (100 * 100 + 100 * 100 + 50 * 50))
    // R(4) over 12 overlapping terms = 3 * (0 + 10000 + 10000 + 2500)
    assert(r.getAs[Long]("r_best") == 3L * 22500L)
    // non-audio bytes are skipped, not stubbed
    val bad = Seq(MediaAsset(1L, "x", "not a wav".getBytes)).toDS()
    assert(Multimodal.audioPeriodicity(bad, 1, 4).count() == 0L)
  }

  test("decodeAvi: MJPEG round trip — frames equal standalone JPEG decode") {
    def px(f: Int)(x: Int, y: Int) = ((x * 7 + f * 19) % 256,
      (y * 13 + f) % 256, (x + y + f * 3) % 256)
    val payloads = (0 until 3).map(f => Multimodal.encodeJpeg(16, 10, px(f)))
    val avi = Multimodal.encodeAvi(16, 10, 40000, payloads)
    val Some((info, frames)) = Multimodal.decodeAvi(avi)
    assert(info == Multimodal.AviInfo(16, 10, 3, 40000))
    assert(frames.map(_.frameIdx) == Vector(0, 1, 2))
    assert(frames.map(_.byteLen) == payloads.map(_.length).toVector)
    // each frame's stats must equal the standalone JPEG decoder's: the
    // container walk may not corrupt a single payload byte
    payloads.zip(frames).foreach { case (p, f) =>
      assert(Multimodal.decodeJpeg(p).contains(f.stats), s"frame ${f.frameIdx}")
    }
  }

  test("decodeAvi: lossless PNG frames pin exact pixel stats through the container") {
    // PNG frames: decoded pixels equal the encoder input bit-for-bit,
    // so the stats through the AVI path replay the pure pixel formula
    def px(x: Int, y: Int) = (x % 256, y % 256, (x + y) % 256)
    val p = Multimodal.encodePng(9, 7, px)
    val avi = Multimodal.encodeAvi(9, 7, 33333, Seq(p, p))
    val Some((_, frames)) = Multimodal.decodeAvi(avi)
    assert(frames.size == 2)
    val expect = Multimodal.decodePng(p).get
    assert(frames.forall(_.stats == expect.copy(format = expect.format)))
    assert(frames.head.stats.nPixels == 63L)
  }

  test("decodeAvi: malformed input degrades, never crashes") {
    val good = Multimodal.encodeAvi(8, 8, 40000,
      Seq(Multimodal.encodeJpeg(8, 8, (x, y) => (x, y, x + y))))
    // wrong magic / truncated container / truncated mid-frame
    assert(Multimodal.decodeAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeAvi(good.take(20)).isEmpty)
    val cut = good.take(good.length - 5)
    assert(Multimodal.decodeAvi(cut).forall(_._2.isEmpty))
    // corrupt ONE frame of three: the other two still decode
    def pxf(f: Int)(x: Int, y: Int) = ((x + f) % 256, y % 256, f % 256)
    val ps = (0 until 3).map(f => Multimodal.encodeJpeg(8, 8, pxf(f)))
    val avi3 = Multimodal.encodeAvi(8, 8, 40000,
      Seq(ps(0), "garbage frame bytes".getBytes, ps(2)))
    val Some((_, fs)) = Multimodal.decodeAvi(avi3)
    assert(fs.map(_.frameIdx) == Vector(0, 2))
    // decompression-bomb header: avih claiming 20000x20000 rejects
    val bomb = good.clone()
    // avih payload starts at 12 (LIST hdr) + 12 (hdrl+avih hdr) = 32;
    // width at +32, height at +36 of the payload
    def putLe32(o: Int, v: Int): Unit = {
      bomb(o) = v.toByte; bomb(o + 1) = (v >> 8).toByte
      bomb(o + 2) = (v >> 16).toByte; bomb(o + 3) = (v >> 24).toByte
    }
    putLe32(32 + 32, 20000); putLe32(32 + 36, 20000)
    assert(Multimodal.decodeAvi(bomb).isEmpty)
  }

  test("sampleVideoFrames: extracted payloads are the standalone JPEGs, stride + cap honored") {
    def px(f: Int)(x: Int, y: Int) = ((x * 5 + f * 31) % 256,
      (y * 11 + f) % 256, (x + y + f * 7) % 256)
    val payloads = (0 until 5).map(f => Multimodal.encodeJpeg(10, 8, px(f)))
    val avi = Multimodal.encodeAvi(10, 8, 40000, payloads)
    val ds = Seq(MediaAsset(11L, "video", avi),
      MediaAsset(12L, "not-a-video", "plain bytes".getBytes)).toDS()
    val rows = Multimodal.sampleVideoFrames(ds, stride = 2, maxFrames = 2)
      .orderBy("frame_idx").collect()
    // stride 2 of frames 0..4 → 0, 2, 4; cap 2 → 0, 2; non-AVI: no rows
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(rows.map(_.getAs[Long]("ts_micros")).toSeq == Seq(0L, 80000L))
    assert(rows.forall(_.getAs[Long]("asset_id") == 11L))
    // each extracted payload is byte-identical to the encoded frame —
    // the container walk may not touch a single payload byte
    rows.foreach { r =>
      val idx = r.getAs[Int]("frame_idx")
      assert(r.getAs[Array[Byte]]("payload").toSeq == payloads(idx).toSeq,
        s"frame $idx payload differs")
    }
  }

  test("decode dispatch: AVI yields real video features, not the fallback") {
    val avi = Multimodal.encodeAvi(12, 8, 40000,
      Seq(Multimodal.encodeJpeg(12, 8, (x, y) => (128, 128, 128)),
        Multimodal.encodeJpeg(12, 8, (x, y) => (128, 128, 128))))
    val (n, feats) = Multimodal.decode(avi)
    assert(n == 2)
    assert(feats(0) == 12f && feats(1) == 8f)
    assert(feats(2) > 0.4f && feats(2) < 0.6f) // mid-gray luma
    assert(feats(5) == 40f) // ms per frame
    // videoFrameStats: distributed per-frame rows with exact timestamps
    val ds = Seq(MediaAsset(5L, "video", avi)).toDS()
    val rows = Multimodal.videoFrameStats(ds)
      .orderBy("frame_idx").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("ts_micros")).toSeq == Seq(0L, 40000L))
    assert(rows.forall(_.getAs[String]("format") == "jpeg"))
    assert(rows.forall(_.getAs[Int]("n_decoded") == 2))
  }

  test("dhash64: q241 fixture — re-encode invariant for all 110 classes, " +
      "planted cross-class structure, bucket margin") {
    val nClasses = Fixtures.DhashClasses.toInt
    val hashes = (0 until nClasses).map { gid =>
      val m0 = Fixtures.dhashMedia(gid, 0)
      val m1 = Fixtures.dhashMedia(gid, 1)
      // the two quality variants are genuinely different content to an
      // exact signature: different bytes AND different decoded pixels
      assert(!java.util.Arrays.equals(m0, m1), s"class $gid: same bytes")
      val Some((w0, h0, px0)) = Multimodal.decodePixels(m0)
      val Some((_, _, px1)) = Multimodal.decodePixels(m1)
      val pixelsDiffer = (0 until h0).exists(y =>
        (0 until w0).exists(x => px0(x, y) != px1(x, y)))
      assert(pixelsDiffer, s"class $gid: lossy variants decoded identically")
      // ...yet the PERCEPTUAL hash is identical: cell margins (20 luma
      // units) dwarf JPEG quantization noise, so no comparison flips
      val Some(d0) = Multimodal.dhash64(m0)
      val Some(d1) = Multimodal.dhash64(m1)
      assert(d0 == d1, s"class $gid: re-encode flipped dHash bits " +
        s"(hamming ${java.lang.Long.bitCount(d0 ^ d1)})")
      d0
    }
    // cross-class separation: every cross pair keeps a >= 5-bit margin
    // above maxDist=3, so q241's output is exactly the 110 planted
    // within-class families and nothing else
    assert(hashes.distinct.size == nClasses)
    for (g1 <- 0 until nClasses; g2 <- g1 + 1 until nClasses) {
      val d = java.lang.Long.bitCount(hashes(g1) ^ hashes(g2))
      assert(d >= 5, s"cross pair ($g1,$g2) at hamming $d < 5 margin")
    }
    // blocked-equals-all-pairs precondition (q241 doc cap caveat): at
    // most 2*DhashClasses distinct signatures can ever share a band
    // bucket — an order of magnitude under hammingPairs' 1000 cap
    assert(2 * nClasses <= 220 && 220 < 1000)
    // golden table agreement: the committed pin matches a fresh decode
    val golden = spark.read
      .parquet("fixtures/dhash_golden.parquet")
      .collect()
      .map(r => (r.getAs[Long]("gid"), r.getAs[Int]("variant")) ->
        r.getAs[Long]("dh")).toMap
    assert(golden.size == 2 * nClasses)
    for (g <- 0 until nClasses; v <- 0 to 1)
      assert(golden((g.toLong, v)) == hashes(g),
        s"golden pin stale for class $g variant $v — rerun DhashGolden")
  }

  test("energyEnvelope: q242 fixture — exact amplitude invariance for " +
      "all 150 classes, signatures split what q240's exact sums split") {
    val nClasses = Fixtures.AudioEnvClasses.toInt
    val sigs = (0 until nClasses).map { gid =>
      val envs = (0 to 2).map { ampIdx =>
        val id = gid.toLong + ampIdx * Fixtures.AudioEnvClasses
        val Some((_, samples)) =
          Multimodal.decodeWavSamples(Fixtures.wavScaledAssetFor(id).media)
        // scaled copies are genuinely different content to q240's exact
        // signature: Σs² scales by amp², so the sums differ...
        (samples.length, samples.map(s => s.toLong * s).sum,
          Multimodal.energyEnvelope(samples, windows = 8, scale = 1000L).toSeq)
      }
      assert(envs.map(_._2).distinct.size == 3,
        s"class $gid: amp variants share Σs² — fixture broken")
      // ...yet the normalized envelope is EXACTLY equal across ×1/×2/×3
      assert(envs.map(_._3).distinct.size == 1,
        s"class $gid: envelope not amplitude-invariant: ${envs.map(_._3)}")
      (envs.head._1, envs.head._3)
    }
    // cross-class separation: (n, envelope) keys are pairwise distinct,
    // so q242's groups are exactly the 150 planted classes
    assert(sigs.distinct.size == nClasses)
  }

  test("energyEnvelope: q246 fixture — exact cross-sample-rate invariance " +
      "for all 150 classes, cross-class separation at equal duration") {
    val nClasses = Fixtures.AudioRateClasses.toInt
    val sigs = (0 until nClasses).map { gid =>
      val envs = (0 to 2).map { rix =>
        val id = gid.toLong + rix * Fixtures.AudioRateClasses
        val Some((info, samples)) =
          Multimodal.decodeWavSamples(Fixtures.wavRateAssetFor(id).media)
        // the re-encodes are genuinely different to every exact
        // signature: r× the samples, r× the header rate...
        assert(info.sampleRate == 8000 * (1 << rix) &&
          samples.length == (64 + 8 * (gid % 5)) * (1 << rix),
          s"class $gid rate-index $rix: fixture shape broken")
        (samples.length.toLong * 1000L / info.sampleRate,
          Multimodal.energyEnvelope(samples, windows = 8, scale = 1000L).toSeq)
      }
      // ...yet duration and normalized envelope are EXACTLY equal
      // across 8/16/32 kHz (r scales E_w and ΣE identically, and the
      // window-aligned base length keeps repeat-groups whole)
      assert(envs.distinct.size == 1,
        s"class $gid: envelope not rate-invariant: $envs")
      envs.head
    }
    // cross-class separation: (duration_ms, envelope) pairwise distinct
    // — classes SHARING a duration (gid ≡ mod 5) split on the envelope
    // alone, so q246's groups are exactly the 150 planted classes
    assert(sigs.distinct.size == nClasses)
  }

  test("video frame dHash: q243 fixture — per-frame re-encode invariance " +
      "for all 120 classes, sequence distinctness, golden agreement") {
    val nClasses = Fixtures.VideoPerceptClasses.toInt
    val sigs = (0 until nClasses).map { gid =>
      val seqs = (0 to 1).map { variant =>
        val media = Fixtures.videoPerceptMedia(gid, variant)
        val Some((_, frames)) = Multimodal.framePayloads(media)
        frames.sortBy(_._1).map { case (idx, payload) =>
          Multimodal.dhash64(payload).getOrElse(
            fail(s"class $gid variant $variant frame $idx failed to hash"))
        }
      }
      // lossy: the two variants are different container bytes...
      assert(!java.util.Arrays.equals(Fixtures.videoPerceptMedia(gid, 0),
        Fixtures.videoPerceptMedia(gid, 1)))
      // ...but every frame's perceptual hash is quality-invariant
      assert(seqs(0) == seqs(1),
        s"class $gid: re-encode changed a frame dHash")
      assert(seqs(0).size == (2 + gid % 3), s"class $gid frame count")
      seqs(0)
    }
    // sequence identity separates classes: q243's groups are exactly
    // the 120 planted cross-quality families
    assert(sigs.distinct.size == nClasses)
    // committed golden pin matches a fresh decode, variant by variant
    val golden = spark.read
      .parquet("fixtures/video_dhash_golden.parquet")
      .collect()
      .map(r => (r.getAs[Long]("gid"), r.getAs[Int]("variant"),
        r.getAs[Int]("frame_idx")) -> r.getAs[Long]("dh")).toMap
    for (g <- 0 until nClasses; v <- 0 to 1; f <- 0 until (2 + g % 3))
      assert(golden((g.toLong, v, f)) == sigs(g)(f),
        s"golden pin stale for ($g, $v, $f) — rerun VideoDhashGolden")
  }

  test("dhash64: q244 fixture — BMP/PPM/PNG/JPEG of one class hash " +
      "identically and equal the closed integer form") {
    val nClasses = Fixtures.DhashClasses.toInt
    for (gid <- 0 until nClasses) {
      // closed form: every pattern cell is constant within its 4x4
      // grid cell, so the cell-mean comparison IS the pattern-value
      // comparison — the same formula the q244 oracle replays in SQL
      def v(cx: Int, cy: Int): Int = {
        val s = gid % 10 + 1; val t = gid / 10
        30 + 20 * (((cy * 9 + cx) * s + t) % 11)
      }
      var want = 0L
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (v(cx + 1, cy) > v(cx, cy)) want |= 1L << (cy * 8 + cx)
      val hs = (0 to 3).map(fmt =>
        Multimodal.dhash64(Fixtures.formatMedia(gid, fmt)).getOrElse(
          fail(s"class $gid format $fmt failed to hash")))
      assert(hs.forall(_ == want),
        s"class $gid: format hashes $hs != closed form $want")
    }
  }

  test("energyEnvelope: silence, window mapping, and the overflow guard") {
    // all-silent clip: no division by zero, all-zero envelope
    assert(Multimodal.energyEnvelope(Array.fill(16)(0), 8, 1000L).toSeq ==
      Seq.fill(8)(0L))
    // single-spike clip: all energy quantizes into the spike's window
    val spike = Array.fill(16)(0); spike(12) = 100 // window 12*8/16 = 6
    val env = Multimodal.energyEnvelope(spike, 8, 1000L)
    assert(env(6) == 1000L && env.sum == 1000L)
    // n·scale over the 2^32 envelope raises instead of corrupting
    intercept[IllegalArgumentException] {
      Multimodal.energyEnvelope(Array.fill(5000000)(1), 8, 1000L)
    }
  }
}
