package graft

import graft.functions.{Distances, TextFunctions}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query+oracle registrations: one family slice of the [[Queries]]
  * surface (split from the former monolithic Queries.scala; the
  * registry maps stay in [[Queries]]).
  */
private[graft] trait QueriesMultimodal { this: Queries.type =>
  // -------------------------------------------------------------- multimodal
  /** REAL image decode end to end (round-3 verdict #3): per document a
    * small BMP (even ids) or PPM (odd ids) is synthesized from a pure
    * integer pixel formula, pushed through the byte-level decoders
    * ([[Multimodal.decodeBmp]]/[[decodePpm]] — header parse, padded
    * bottom-up BGR rows vs top-down RGB), and reduced to image stats.
    * The decoders accumulate INTEGER sums (scaled luma, edge counts), so
    * the oracle replays the pixel formula in SQL and reproduces them
    * exactly — the `format` column comes from the parsed magic, so a
    * decoder silently falling back would flip it and fail the hash.
    */

  private[graft] def imageStatsFrom(s: SparkSession, dir: String,
      mk: Long => Multimodal.MediaAsset): DataFrame = {
    import s.implicits._
    val assets = t(s, dir, "documents").select(col("doc_id")).as[Long].map(mk)
    Multimodal.imageStats(assets)
      .select(col("asset_id"), col("format"), col("width"), col("height"),
        round(col("luma_sum").cast("double") /
          (lit(255000.0) * col("n_pixels")), 6).as("mean_luma"),
        round(col("edge_count").cast("double") /
          col("h_pairs").cast("double"), 6).as("edge_density"))
      .orderBy("asset_id")
  }

  def imageDecode(s: SparkSession, dir: String): DataFrame =
    imageStatsFrom(s, dir, Fixtures.imageAssetFor _)

  /** q66: the q57 pipeline through a COMPRESSED (lossless) format — the
    * PNG bytes round-trip through a real zlib inflate inside
    * [[Multimodal.decodePng]], and the stats still hash-match the pure
    * pixel-formula oracle. The `format` column ('png', from the parsed
    * magic) proves the compressed path ran, not a stub fallback. */
  def pngDecode(s: SparkSession, dir: String): DataFrame =
    imageStatsFrom(s, dir, Fixtures.pngAssetFor _)

  /** Scaled-luma pixel formula at (x, y) for doc `d` — must stay in
    * lockstep with [[imageDecode]]'s `px`. */
  private[graft] def lumaSqlAt(d: String, x: String, y: String): String =
    s"(299 * (($d*7 + ($x)*3 + ($y)*5) % 256) + " +
      s"587 * (($d*11 + ($x)*13 + ($y)) % 256) + " +
      s"114 * (($d + ($x) + ($y)*17) % 256))"

  private[graft] def imageStatsOracleSql(formatExpr: String): String = {
    val li = lumaSqlAt("i.doc_id", "xs.x", "ys.y")
    val liNext = lumaSqlAt("i.doc_id", "xs.x + 1", "ys.y")
    s"""WITH img AS (SELECT doc_id, CAST(8 + doc_id % 8 AS INT) AS w,
       |                    CAST(8 + doc_id % 5 AS INT) AS h FROM documents),
       |xs AS (SELECT unnest(range(0, 15)) AS x),
       |ys AS (SELECT unnest(range(0, 12)) AS y),
       |lum AS (
       |  SELECT i.doc_id, SUM($li) AS luma_sum
       |  FROM img i CROSS JOIN xs CROSS JOIN ys
       |  WHERE xs.x < i.w AND ys.y < i.h GROUP BY i.doc_id),
       |ed AS (
       |  SELECT i.doc_id,
       |    SUM(CASE WHEN abs(($liNext) - ($li)) > 25500 THEN 1 ELSE 0 END) AS edges
       |  FROM img i CROSS JOIN xs CROSS JOIN ys
       |  WHERE xs.x < i.w - 1 AND ys.y < i.h GROUP BY i.doc_id)
       |SELECT i.doc_id AS asset_id,
       |  $formatExpr AS format,
       |  i.w AS width, i.h AS height,
       |  round(CAST(l.luma_sum AS DOUBLE) / (255000.0E0 * (i.w * i.h)), 6) AS mean_luma,
       |  round(CAST(e.edges AS DOUBLE) / CAST((i.w - 1) * i.h AS DOUBLE), 6) AS edge_density
       |FROM img i JOIN lum l ON l.doc_id = i.doc_id
       |           JOIN ed e ON e.doc_id = i.doc_id
       |ORDER BY asset_id""".stripMargin
  }

  val imageDecodeSql: String =
    imageStatsOracleSql("CASE WHEN i.doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END")

  // identical pixel-formula replay; the only difference is that the
  // Spark side went through a real zlib-compressed codec to get there
  val pngDecodeSql: String = imageStatsOracleSql("'png'")

  /** q87: the q66 pipeline through the LOSSY JPEG codec (the dominant
    * web-corpus format; JDK-builtin reader, still no external codec).
    * The oracle splits by what is knowable: dimensions and format come
    * from the exact formula (verifying the Spark side's pre-ImageIO SOF
    * marker parse), while decoded luma/edge stats and encoder byte
    * length — decoder/encoder properties, unreproducible by formula —
    * join from the COMMITTED golden table ([[graft.tools.JpegGolden]]).
    * A JDK codec change breaks the hash match loudly, which is the pin
    * working as designed.
    */
  def jpegDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE narrow pass: encode + decode + byte length per doc in the
    // same mapPartitions — two independent consumers of an assets
    // Dataset would JPEG-encode every document twice
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val a = Fixtures.jpegAssetFor(id)
          Multimodal.decodeJpeg(a.media).map(st =>
            (a.asset_id, st.format, st.width, st.height,
              a.media.length.toLong, st.lumaSum, st.nPixels,
              st.edgeCount, st.hPairs))
        }
      }
      .toDF("asset_id", "format", "width", "height", "byte_len",
        "luma_sum", "n_pixels", "edge_count", "h_pairs")
      .select(col("asset_id"), col("format"), col("width"), col("height"),
        col("byte_len"),
        round(col("luma_sum").cast("double") /
          (lit(255000.0) * col("n_pixels")), 6).as("mean_luma"),
        round(col("edge_count").cast("double") /
          col("h_pairs").cast("double"), 6).as("edge_density"))
      .orderBy("asset_id")
  }

  val jpegDecodeSql: String =
    s"""WITH img AS (SELECT doc_id, CAST(8 + doc_id % 8 AS INT) AS w,
       |                    CAST(8 + doc_id % 5 AS INT) AS h FROM documents),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/jpeg_golden.parquet/*.parquet'))
       |SELECT i.doc_id AS asset_id, 'jpeg' AS format,
       |  i.w AS width, i.h AS height, g.byte_len,
       |  round(CAST(g.luma_sum AS DOUBLE) / (255000.0E0 * (i.w * i.h)), 6) AS mean_luma,
       |  round(CAST(g.edge_count AS DOUBLE) / CAST((i.w - 1) * i.h AS DOUBLE), 6) AS edge_density
       |FROM img i JOIN g ON g.gid = i.doc_id % ${Fixtures.JpegGeomPeriod}
       |ORDER BY asset_id""".stripMargin

  /** q231: REAL video frame decode — MJPEG-in-AVI through
    * [[Multimodal.decodeAvi]] (RIFF container walk + per-frame JPEG
    * decode; no external codec, no stub anywhere on this path). One row
    * per decoded frame. The oracle splits by what is knowable exactly
    * like q87: frame indices, the 25 fps timestamps, geometry and
    * frame counts replay from the fixture formula (verifying the
    * container parse end-to-end), while per-frame byte length and
    * decoded luma/edge stats — encoder/decoder properties — join from
    * the committed golden table ([[graft.tools.VideoGolden]]).
    */
  def videoDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(Fixtures.videoAssetFor _)
    Multimodal.videoFrameStats(assets)
      .select(col("asset_id"), col("frame_idx"), col("ts_micros"),
        col("format"), col("width"), col("height"), col("frame_bytes"),
        col("n_decoded"), col("n_declared"),
        round(col("luma_sum").cast("double") /
          (lit(255000.0) * col("n_pixels")), 6).as("mean_luma"),
        round(col("edge_count").cast("double") /
          col("h_pairs").cast("double"), 6).as("edge_density"))
      .orderBy("asset_id", "frame_idx")
  }

  val videoDecodeSql: String =
    s"""WITH img AS (SELECT doc_id, CAST(8 + doc_id % 8 AS INT) AS w,
       |                    CAST(8 + doc_id % 5 AS INT) AS h,
       |                    CAST(2 + doc_id % 4 AS INT) AS nf
       |             FROM documents),
       |fr AS (SELECT i.doc_id, i.w, i.h, i.nf, CAST(f.f AS INT) AS f
       |  FROM img i JOIN (SELECT unnest(range(0, 5)) AS f) f
       |    ON f.f < i.nf),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/video_golden.parquet/*.parquet'))
       |SELECT fr.doc_id AS asset_id, fr.f AS frame_idx,
       |  CAST(fr.f AS BIGINT) * ${Fixtures.VideoMicroSecPerFrame} AS ts_micros,
       |  'jpeg' AS format, fr.w AS width, fr.h AS height,
       |  g.byte_len AS frame_bytes, fr.nf AS n_decoded,
       |  fr.nf AS n_declared,
       |  round(CAST(g.luma_sum AS DOUBLE) / (255000.0E0 * (fr.w * fr.h)), 6) AS mean_luma,
       |  round(CAST(g.edge_count AS DOUBLE) / CAST((fr.w - 1) * fr.h AS DOUBLE), 6) AS edge_density
       |FROM fr JOIN g ON g.gid = fr.doc_id % ${Fixtures.VideoGeomPeriod}
       |  AND g.frame_idx = fr.f
       |ORDER BY asset_id, frame_idx""".stripMargin

  /** q237: VIDEO corpus dedup by DECODED content — the multimodal twin
    * of q16's exact text dedup: each video's identity is the ordered
    * multiset of its decoded per-frame integer stats (frame_idx,
    * luma_sum, edge_count, payload bytes), so two videos group together
    * iff the DECODER sees identical frames — a container-level byte
    * diff (chunk padding, header noise) does NOT split a group, which
    * is exactly why video dedup must run on decoded content, not file
    * hashes. Fixture plants real duplicates (assets built from
    * `doc_id % 250` → copies per class at every scale factor). One
    * narrow decode pass, one signature aggregation, one group-by —
    * corpus-sized, no pairs. Oracle: signatures replayed from the
    * committed golden frame table, groups formula-exact.
    */
  def videoDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaAsset(id, "video",
        Fixtures.videoAssetFor(id % 250).media))
    val part = concat_ws(":", col("frame_idx"), col("luma_sum"),
      col("edge_count"), col("frame_bytes"))
    val sig = Multimodal.videoFrameStats(assets)
      .groupBy(col("asset_id"))
      .agg(concat_ws("|", sort_array(collect_list(part))).as("__sig"),
        count(lit(1)).as("__nf"))
    sig.groupBy(col("__sig"))
      .agg(min(col("asset_id")).as("rep_id"),
        count(lit(1)).as("n_copies"), min(col("__nf")).as("n_frames"))
      .select(col("rep_id"), col("n_copies"), col("n_frames"))
      .orderBy("rep_id")
  }

  val videoDedupSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id % 250 AS gid FROM documents),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/video_golden.parquet/*.parquet')),
       |part AS (SELECT d.doc_id,
       |    concat_ws(':', CAST(g.frame_idx AS VARCHAR),
       |      CAST(g.luma_sum AS VARCHAR), CAST(g.edge_count AS VARCHAR),
       |      CAST(g.byte_len AS VARCHAR)) AS p
       |  FROM d JOIN g ON g.gid = d.gid),
       |sig AS (SELECT doc_id,
       |    array_to_string(array_agg(p ORDER BY p), '|') AS s,
       |    CAST(COUNT(*) AS BIGINT) AS nf
       |  FROM part GROUP BY doc_id)
       |SELECT MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_copies,
       |  MIN(nf) AS n_frames
       |FROM sig GROUP BY s ORDER BY rep_id""".stripMargin

  /** q241: PERCEPTUAL image near-dup — the gap q237/q240 leave open:
    * their exact decoded-content signatures cannot group a RE-ENCODED
    * copy (same picture, different JPEG quality ⇒ different decoded
    * pixels). Here each asset gets a 64-bit dHash over its decoded luma
    * grid ([[Multimodal.dhash64]]) and near-dups are found by the q19
    * pigeonhole recipe ([[Dedup.hammingPairs]]): identical hashes
    * collapse, 4×16-bit blocks bucket candidates (lossless for
    * Hamming ≤ 3), bit_count(xor) verifies. The fixture plants real
    * re-encodes — 110 image classes each encoded at JPEG quality 0.9
    * AND 0.5 ([[Fixtures.dhashAssetFor]]); the two variants of a class
    * decode to DIFFERENT pixels but identical dHashes (cell margins 20×
    * the compression noise — MultimodalSpec pins this for all 110
    * classes), so exactly the pairs an exact signature misses appear
    * here. Cross-class pairs keep a ≥ 5-bit Hamming margin above
    * maxDist = 3 (spec-pinned), so the output is exactly the 110
    * planted within-class families — no accidental cross matches. Oracle: hashes join from the committed golden table
    * ([[graft.tools.DhashGolden]] — JPEG decode is decoder-dependent,
    * the q87 pin rationale), then the ENTIRE pairing replays as
    * all-pairs Hamming ≤ 3 — equal to the blocked pipeline by the
    * pigeonhole guarantee, everything downstream of the decode exact.
    *
    * Cap caveat: blocked ≡ all-pairs additionally requires that no band
    * bucket exceeds [[Dedup.hammingPairs]]'s `maxBucketSize` (capped
    * buckets are DROPPED by design — a scale guard, not a recall
    * guarantee). Here the signature space is ≤ 2·[[Fixtures.DhashClasses]]
    * DISTINCT hashes (exact copies collapse before blocking), so every
    * bucket holds ≤ 220 representatives — an order of magnitude under
    * the 1000 cap; MultimodalSpec asserts the margin so a fixture
    * change that breaks the equality fails a spec, not the oracle.
    */
  def imagePhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          Multimodal.dhash64(Fixtures.dhashAssetFor(id).media).map(dh => (id, dh))
        }
      }.toDF("doc_id", "dh")
    Dedup.hammingPairs(hashes, "doc_id", "dh", maxDist = 3)
      .orderBy("id_a", "id_b")
  }

  val imagePhashDedupSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id % ${Fixtures.DhashClasses} AS gid,
       |    CAST((doc_id // ${Fixtures.DhashClasses}) % 2 AS INT) AS variant
       |  FROM documents),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/dhash_golden.parquet/*.parquet')),
       |h AS (SELECT d.doc_id, g.dh FROM d
       |  JOIN g ON g.gid = d.gid AND g.variant = d.variant)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
       |FROM h a JOIN h b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dh, b.dh)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** q243: PERCEPTUAL video near-dup — completes the perceptual sweep
    * (image q241, audio q242): a re-encoded video copy (same frames,
    * different MJPEG quality) decodes to different pixels, so q237's
    * exact frame-stat signature splits it; here each frame gets the
    * q241 dHash ([[Multimodal.dhash64]] over the extracted JPEG
    * payloads — [[Multimodal.framePayloads]] walks the container
    * without paying for stats) and the clip's identity is the ORDERED
    * frame-dHash sequence. Because the fixture's cell margins make
    * every frame hash re-encode-invariant
    * ([[Fixtures.videoPerceptAssetFor]] — spec-pinned for all 120
    * classes), cross-quality copies collapse by exact sequence
    * equality: one decode pass + one aggregation, no pair join, the
    * q237 scale shape with q241 robustness. Assets where any frame
    * fails to hash are SKIPPED loudly-by-absence (flatMap None), never
    * grouped on a partial sequence — a silent prefix match would be a
    * wrong answer. Oracle: per-frame hashes join from the committed
    * golden table ([[graft.tools.VideoDhashGolden]] — JPEG decode is
    * decoder-dependent, the q87/q241 pin rationale), then the ordered
    * string_agg and grouping replay exactly.
    */
  def videoPhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val a = Fixtures.videoPerceptAssetFor(id)
          Multimodal.framePayloads(a.media).flatMap { case (_, frames) =>
            val hs = frames.sortBy(_._1).map(f => Multimodal.dhash64(f._2))
            if (hs.exists(_.isEmpty)) None
            else Some((id, frames.size.toLong,
              hs.map(_.get).mkString("|")))
          }
        }
      }.toDF("asset_id", "n_frames", "sig")
    sigs.groupBy(col("n_frames"), col("sig"))
      .agg(min(col("asset_id")).as("rep_id"),
        count(lit(1)).as("n_copies"))
      .select(col("rep_id"), col("n_copies"), col("n_frames"))
      .orderBy("rep_id")
  }

  val videoPhashDedupSql: String =
    s"""WITH d AS (SELECT doc_id,
       |    doc_id % ${Fixtures.VideoPerceptClasses} AS gid,
       |    CAST((doc_id // ${Fixtures.VideoPerceptClasses}) % 2 AS INT)
       |      AS variant
       |  FROM documents),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/video_dhash_golden.parquet/*.parquet')),
       |sig AS (SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS nf,
       |    string_agg(CAST(g.dh AS VARCHAR), '|' ORDER BY g.frame_idx)
       |      AS s
       |  FROM d JOIN g ON g.gid = d.gid AND g.variant = d.variant
       |  GROUP BY d.doc_id)
       |SELECT MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_copies,
       |  MIN(nf) AS n_frames
       |FROM sig GROUP BY nf, s ORDER BY rep_id""".stripMargin

  /** q244: cross-FORMAT image identity — the q241 robustness argument
    * taken across CONTAINERS instead of qualities: each class is
    * planted as BMP, PPM, PNG (lossless) and JPEG 0.9 (lossy)
    * ([[Fixtures.formatAssetFor]]); byte hashes split all four, exact
    * pixel signatures still split JPEG from the lossless trio, the
    * dHash collapses everything. Grouping is EXACT on the 64-bit hash
    * (the four formats hash identically — spec-pinned with the closed
    * form), so the shape is the scale-safe q237 one: one decode pass,
    * one aggregation, class-grain output, no pair join. Oracle: the
    * dHash has a CLOSED INTEGER FORM on this fixture (every pattern
    * cell is constant within its 4×4 grid cell, so the cell-mean
    * comparison reduces to comparing pattern values), which the SQL
    * replays from scratch — engine-independent, no golden table, even
    * though one planted format is lossy. The oracle groups by ITS OWN
    * formula hash; group equality (not hash-value equality) is what
    * the output exposes, so the replay verifies the partition itself.
    */
  def imageFormatDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        Multimodal.dhash64(Fixtures.formatAssetFor(id).media)
          .map(dh => (id, dh))
      }).toDF("doc_id", "dh")
    hashes
      .withColumn("fmt",
        expr(s"(doc_id div ${Fixtures.DhashClasses}) % 4"))
      .groupBy(col("dh"))
      .agg(min(col("doc_id")).as("rep_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("fmt")).as("n_formats"))
      .select(col("rep_id"), col("n_copies"), col("n_formats"))
      .orderBy("rep_id")
  }

  val imageFormatDedupSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id % ${Fixtures.DhashClasses} AS gid,
       |    (doc_id // ${Fixtures.DhashClasses}) % 4 AS fmt
       |  FROM documents),
       |cls AS (SELECT DISTINCT gid FROM d),
       |cells AS (SELECT gid, cy, cx,
       |    30 + 20 * (((cy * 9 + cx) * (gid % 10 + 1) + (gid // 10)) % 11)
       |      AS v
       |  FROM cls
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS cy) a
       |  CROSS JOIN (SELECT unnest(range(0, 9)) AS cx) b),
       |bits AS (SELECT l.gid, l.cy, l.cx,
       |    CASE WHEN r.v > l.v THEN 1 ELSE 0 END AS bit
       |  FROM cells l JOIN cells r
       |    ON r.gid = l.gid AND r.cy = l.cy AND r.cx = l.cx + 1
       |  WHERE l.cx < 8),
       |dh AS (SELECT gid,
       |    SUM(bit * (CAST(1 AS HUGEINT) << (cy * 8 + cx))) AS h
       |  FROM bits GROUP BY gid)
       |SELECT MIN(d.doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_copies,
       |  CAST(COUNT(DISTINCT d.fmt) AS BIGINT) AS n_formats
       |FROM d JOIN dh ON dh.gid = d.gid
       |GROUP BY dh.h ORDER BY rep_id""".stripMargin

  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.documentFeatures(s,
        t(s, dir, "documents").where(col("text").isNotNull))
      .toDF()
      .select(col("asset_id"), col("byte_len"), col("content_hash"), col("n_frames"))
      .orderBy("asset_id")

  val multimodalFeaturesSql: String =
    """SELECT doc_id AS asset_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS content_hash,
      |  CAST(greatest(1, CAST(ceil(octet_length(encode(text)) / 256.0) AS INT)) AS INT) AS n_frames
      |FROM documents WHERE text IS NOT NULL ORDER BY asset_id""".stripMargin

  /** Frame-sampling plumbing over the stub binary column: every 2nd
    * 256-byte frame, capped at 10 frames per asset; output is the frame
    * geometry (index + byte length), which DuckDB replays over the same
    * encoded text.
    */
  private[graft] val FrameStride = 2
  private[graft] val MaxFrames = 10

  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = t(s, dir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id").as("asset_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[Multimodal.MediaAsset]
    Multimodal.sampleFrames(assets, stride = FrameStride, maxFrames = MaxFrames)
      .select(col("asset_id"), col("frame_idx"),
        octet_length(col("frame_bytes")).as("frame_len"))
      .orderBy("asset_id", "frame_idx")
  }

  val frameSampleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, octet_length(encode(text)) AS len FROM documents
       |  WHERE text IS NOT NULL),
       |f AS (
       |  SELECT doc_id, len,
       |    unnest(range(0, greatest(1, CAST(ceil(len / ${Multimodal.FrameBytes}.0) AS INT)),
       |           $FrameStride)) AS frame_idx
       |  FROM d)
       |SELECT doc_id AS asset_id, CAST(frame_idx AS INT) AS frame_idx,
       |  CAST(least(${Multimodal.FrameBytes}, len - frame_idx * ${Multimodal.FrameBytes}) AS INT) AS frame_len
       |FROM f WHERE frame_idx < ${FrameStride * MaxFrames} ORDER BY asset_id, frame_idx""".stripMargin

  /** Batch gap sessionization (30 min) over the event stream, on the
    * microsecond-truncated timeline (see [[asofClickView]]). The
    * declarative twin of the streaming sessionizer — StreamOpsSpec
    * asserts the two produce identical sessions.
    */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").withColumn("ts", expr("ts div 1000"))
    Sessionize.sessions(ev, "user_id", "ts", "event_id", "value",
        gap = 30L * 60 * 1000 * 1000)
      .orderBy("user_id", "session_start")
  }

  val sessionizeBatchSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts, value FROM events),
      |l AS (
      |  SELECT user_id, event_id, ts, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
      |  FROM e),
      |f AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN prev IS NULL OR ts - prev > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM l),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM f)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(COUNT(*) AS INT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Salted skew join: orders (probe) ⋈ customer (build) fanned out 16
    * ways, aggregated per market segment. Result is by construction
    * identical to the plain join — which is exactly what the oracle
    * runs.
    */
  def skewJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val probe = t(s, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val build = t(s, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    SkewJoin.saltedInnerJoin(probe, build, Seq("custkey"), numSalts = 16)
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  val skewJoinRevenueSql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** PII scrubbing over synthesized-but-realistic text: each customer row
    * is rendered into a contact blurb (name, derived email, IP, phone),
    * then counted and redacted with [[TextFunctions.scrubPii]]. Both
    * engines build the identical raw text from the same columns and run
    * the identical RE2-safe regexes, so the scrubbed output is
    * hash-verified end to end.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      col("c_name"), lit(" <user"), col("c_custkey").cast("string"),
      lit("@example.com> from 10.0."),
      (col("c_nationkey") % 256).cast("string"), lit("."),
      (col("c_custkey") % 256).cast("string"),
      lit(" call +1 (555) 123-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
    t(s, dir, "customer")
      .where(col("c_custkey") <= 500)
      .select(col("c_custkey"), raw.as("raw"))
      .select(
        col("c_custkey"),
        TextFunctions.piiCount(col("raw"), TextFunctions.PiiPatterns(0)._2).as("n_emails"),
        TextFunctions.piiCount(col("raw"), TextFunctions.PiiPatterns(1)._2).as("n_ips"),
        TextFunctions.scrubPii(col("raw")).as("scrubbed"))
      .orderBy("c_custkey")
  }

  val piiScrubSql: String = {
    val email = TextFunctions.PiiPatterns(0)._2
    val ipv4 = TextFunctions.PiiPatterns(1)._2
    val phone = TextFunctions.PiiPatterns(2)._2
    s"""WITH raw AS (
       |  SELECT c_custkey,
       |    concat(c_name, ' <user', CAST(c_custkey AS VARCHAR),
       |      '@example.com> from 10.0.', CAST(c_nationkey % 256 AS VARCHAR), '.',
       |      CAST(c_custkey % 256 AS VARCHAR), ' call +1 (555) 123-',
       |      lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS raw
       |  FROM customer WHERE c_custkey <= 500)
       |SELECT c_custkey,
       |  CAST(len(regexp_extract_all(raw, '$email')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(raw, '$ipv4')) AS INT) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(raw,
       |    '$email', '[EMAIL]', 'g'), '$ipv4', '[IPV4]', 'g'), '$phone', '[PHONE]', 'g')
       |    AS scrubbed
       |FROM raw ORDER BY c_custkey""".stripMargin
  }

  /** Pivot: per-year order totals spread across status columns (the
    * relational transpose; DuckDB oracle is the equivalent conditional
    * aggregation).
    */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .orderBy("yr")

  val pivotStatusSql: String =
    """SELECT year(o_orderdate) AS yr,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
      |FROM orders GROUP BY year(o_orderdate) ORDER BY yr""".stripMargin

  /** Unpivot/melt: lineitem measures to long form (id, metric, value). */
  def unpivotMeasures(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_orderkey") <= 200)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  val unpivotMeasuresSql: String =
    """SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
      |  FROM lineitem WHERE l_orderkey <= 200
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      |  FROM lineitem WHERE l_orderkey <= 200
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |  FROM lineitem WHERE l_orderkey <= 200)
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  /** Histogram via width_bucket. DuckDB lacks width_bucket; the oracle
    * replays Spark's exact formula — floor((v - lo) / ((hi - lo) /
    * n)) + 1 with the out-of-range buckets 0 and n+1 — in the same IEEE
    * double arithmetic (the bounds divide exactly, so no rounding
    * divergence at bucket edges).
    */
  def histogramPrices(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(width_bucket(col("o_totalprice"), lit(0d), lit(600000d), lit(12)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  val histogramPricesSql: String =
    """SELECT CASE WHEN o_totalprice < 0 THEN 0
      |            WHEN o_totalprice >= 600000 THEN 13
      |            ELSE CAST(FLOOR((o_totalprice - 0) / ((600000 - 0) / 12.0)) AS BIGINT) + 1
      |       END AS bucket, COUNT(*) AS cnt
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Full outer join: per-customer order counts with both dangling sides
    * preserved (customers without orders AND order custkeys outside the
    * restricted customer slice).
    */
  def fullOuterOrders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").where(col("c_custkey") <= 700)
      .select(col("c_custkey").as("custkey"), col("c_acctbal"))
    val o = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .select(col("o_custkey").as("custkey"), col("n_orders"))
    c.join(o, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("c_acctbal"))
      .orderBy("custkey")
  }

  val fullOuterOrdersSql: String =
    """WITH c AS (SELECT c_custkey AS custkey, c_acctbal FROM customer WHERE c_custkey <= 700),
      |o AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
      |SELECT COALESCE(c.custkey, o.custkey) AS custkey,
      |  COALESCE(o.n_orders, 0) AS n_orders, c.c_acctbal
      |FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
      |ORDER BY custkey""".stripMargin

  /** Single-scan column profiler over orders (see [[Profile]]). */
  def profileOrders(s: SparkSession, dir: String): DataFrame =
    Profile.summarize(t(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey"))
      .orderBy("col_name")

  val profileOrdersSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  COUNT(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
         |  MIN(CAST($c AS VARCHAR)) AS min_s, MAX(CAST($c AS VARCHAR)) AS max_s
         |FROM orders""".stripMargin
    Seq("o_orderstatus", "o_orderpriority", "o_custkey").map(one)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Grouped array aggregation: distinct order years per priority,
    * numerically sorted then joined — deterministic, string-comparable
    * across engines.
    */
  def groupArrays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(
          transform(array_sort(collect_set(year(col("o_orderdate")))),
            x => x.cast("string")), ",").as("years"),
        countDistinct(year(col("o_orderdate"))).as("n_years"))
      .orderBy("o_orderpriority")

  val groupArraysSql: String =
    """SELECT o_orderpriority,
      |  array_to_string(list_sort(list(DISTINCT year(o_orderdate))), ',') AS years,
      |  COUNT(DISTINCT year(o_orderdate)) AS n_years
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** 3-gram repetition scoring over documents — the templated/spam-text
    * quality signal. Oracle replays distinct-shingles / windows with the
    * shared DuckDB shingle expression.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        size(TextFunctions.shingles(col("text"), 3)).as("n_distinct_3grams"),
        greatest(TextFunctions.tokenCount(col("text")) - 2, lit(1)).cast("int")
          .as("n_windows"),
        TextFunctions.repetitionRatio(col("text")).as("rep_ratio"))
      .orderBy("doc_id")

  val textRepetitionSql: String =
    s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents
       |  WHERE text IS NOT NULL),
       |sh AS (
       |  SELECT doc_id, len($duckShingles) AS n_distinct_3grams,
       |    greatest(len(toks) - 2, 1) AS n_windows
       |  FROM tok)
       |SELECT doc_id, CAST(n_distinct_3grams AS INT) AS n_distinct_3grams,
       |  CAST(n_windows AS INT) AS n_windows,
       |  floor((1.0 - CAST(n_distinct_3grams AS DOUBLE) / n_windows) * 10000) / 10000
       |    AS rep_ratio
       |FROM sh ORDER BY doc_id""".stripMargin

  /** Window-function breadth: rank / dense_rank / lag / lead / ntile /
    * cumulative sum over one deterministic ordering (q03 covers
    * row_number; this covers the rest of the window family).
    */
  def windowZoo(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .where(col("o_orderkey") <= 2000)
      .select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        ntile(4).over(w).as("quartile"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(wCum)
          .cast("double").as("running_total"))
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  val windowZooSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  lag(o_orderkey, 1) OVER w AS prev_key,
      |  lead(o_orderkey, 1) OVER w AS next_key,
      |  ntile(4) OVER w AS quartile,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_orderpriority
      |          ORDER BY o_totalprice DESC, o_orderkey ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders WHERE o_orderkey <= 2000
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin

  /** Left + right outer joins in one query (full outer is q46): per
    * customer slice, order counts with dangling customers kept (left);
    * then a right join re-expressed against the supplier table.
    */
  def outerJoins(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").where(col("c_custkey") <= 400)
      .select(col("c_custkey"), col("c_nationkey"))
    val o = t(s, dir, "orders").where(year(col("o_orderdate")) === 1995)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders_95"))
    val left = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("n_orders_95"), lit(0L)).as("n_orders_95"),
        col("c_nationkey"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey"), col("s_suppkey"))
    sup.join(left, col("c_nationkey") === col("s_nationkey"), "right")
      .groupBy(col("c_custkey"), col("n_orders_95"))
      .agg(count(col("s_suppkey")).as("n_same_nation_suppliers"))
      .orderBy("c_custkey")
  }

  val outerJoinsSql: String =
    """WITH c AS (SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey <= 400),
      |o AS (SELECT o_custkey, COUNT(*) AS n_orders_95 FROM orders
      |      WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
      |l AS (SELECT c_custkey, COALESCE(o.n_orders_95, 0) AS n_orders_95, c_nationkey
      |      FROM c LEFT JOIN o ON c_custkey = o_custkey)
      |SELECT c_custkey, n_orders_95, COUNT(s_suppkey) AS n_same_nation_suppliers
      |FROM supplier RIGHT JOIN l ON c_nationkey = s_nationkey
      |GROUP BY c_custkey, n_orders_95 ORDER BY c_custkey""".stripMargin

  /** Incremental dedup: a fixed 100-doc incoming batch (doc_id < 100 —
    * constant-size at EVERY scale factor, so the bench always times the
    * small-batch-vs-large-corpus shape the operator is for) checked
    * against the rest of the corpus. Same certified-recall oracle
    * argument as q18 — exact all-pairs Jaccard restricted to cross
    * (new × corpus) pairs.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.minhashLSHJoin(
        docs.where(col("doc_id") < 100), docs.where(col("doc_id") >= 100),
        "doc_id", "text", threshold = 0.7)
      .orderBy("new_id", "corpus_id")
  }

  val dedupIncrementalSql: String =
    s"""WITH tok AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |sh AS (SELECT doc_id, $duckShingles AS sh FROM tok),
       |p AS (
       |  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |          len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < 100 AND b.doc_id >= 100)
       |SELECT new_id, corpus_id, jaccard FROM p WHERE jaccard >= 0.7
       |ORDER BY new_id, corpus_id""".stripMargin

  /** Training-corpus preparation capstone ([[CorpusPrep.clean]]): gate
    * on tokens/quality/language, exact-dedup by content fingerprint,
    * then account the surviving token budget per language — the one-job
    * composition an LLM pipeline runs before near-dup LSH. The oracle
    * replays every stage (the q21 quality formula, the q22 language
    * CASE, the q17 fingerprint dedup) and aggregates with the DECIMAL
    * exact-sum rule, so the hash certifies the whole pipeline, not just
    * its pieces.
    */
  def corpusPrep(s: SparkSession, dir: String): DataFrame =
    // grouped by the declared lang column: on this fixture the text
    // generator writes English-stopword prose under every lang label, so
    // lang_guess is only a gate ('und' drops), not a useful group key
    CorpusPrep.clean(t(s, dir, "documents"), "doc_id", "text")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(sum(col("quality").cast("decimal(10,4)")).cast("double") /
          count(lit(1)), 6).as("avg_quality"))
      .orderBy("lang")

  // shared fragments guarantee lockstep with the q21 (quality), q22
  // (language CASE) and q17 (fingerprint) oracles
  /** The q58 clean-pipeline replay (gate + fingerprint dedup) as a
    * shared CTE chain ending in survivor relation `s` — used verbatim
    * by the q58 oracle and the q70 whole-composition oracle so the two
    * can never drift from [[CorpusPrep.clean]].
    */
  private[graft] def cleanReplayCtes(extraWhere: String): String =
    s"""tok AS (SELECT doc_id, lang, text, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL$extraWhere),
       |m AS (
       |  SELECT doc_id, lang, text, toks, len(toks) AS n_tokens,
       |    $punctStopSqlExprs
       |  FROM tok),
       |q AS (
       |  SELECT doc_id, lang, toks, n_tokens,
       |    $qualitySqlExpr AS quality,
       |    $langGuessCaseSql AS lang_guess
       |  FROM m),
       |f AS (
       |  SELECT *, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
       |  FROM q WHERE n_tokens >= 10 AND quality >= 0.3E0 AND lang_guess <> 'und'),
       |s AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
       |    FROM f) WHERE rn = 1)""".stripMargin

  val corpusPrepSql: String =
    s"""WITH ${cleanReplayCtes("")}
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  round(CAST(SUM(CAST(quality AS DECIMAL(10,4))) AS DOUBLE) / COUNT(*), 6) AS avg_quality
       |FROM s GROUP BY lang ORDER BY lang""".stripMargin

  /** Deterministic stratified downsampling ([[Sampling]]): keep 10% of
    * the dominant language and 50% of the rest by a STABLE md5 bucket of
    * the doc id — reproducible across runs/engines/partitionings (which
    * `df.sample` is not) and externally auditable: the oracle replays
    * the same md5 arithmetic bit-for-bit (q19's portable-hash rule).
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedHashSample(t(s, dir, "documents"), "lang", "doc_id",
        rates = Map("en" -> 10), defaultPct = 50)
      .select(col("doc_id"), col("lang"),
        Sampling.hashBucket(col("doc_id")).as("bucket"))
      .orderBy("doc_id")

  val stratifiedSampleSql: String = {
    // md5 input = salt ␁ id (chr(1)-joined, salt = '' here) — must stay
    // in lockstep with Sampling.hashBucket
    val bucket =
      "CAST(CAST(concat('0x', substr(md5(concat_ws(chr(1), '', CAST(doc_id AS VARCHAR))), 1, 15)) AS UBIGINT) % 100 AS INT)"
    s"""SELECT doc_id, lang, $bucket AS bucket
       |FROM documents
       |WHERE $bucket < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
       |ORDER BY doc_id""".stripMargin
  }

  /** q93: temperature mixture rebalancing
    * ([[Sampling.temperatureSample]], alpha = 1/2) — the dominant
    * language keeps 55% and each rarer one is boosted by
    * sqrt(n_max/n), capped at 1 (fr crosses the cap at sf0.01:
    * 0.55·sqrt(218/64) ≈ 1.016). Output is the per-language mix the
    * sampler produced, all-integer: `kept_id_sum` is an exact checksum
    * of the kept MEMBERSHIP per language, so the oracle pins every
    * individual keep decision, not just the counts.
    */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val kept = Sampling.temperatureSample(d, "lang", "doc_id",
      baseRate = 0.55, salt = "mix")
    kept.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
      // totals are strata-sized; without the hint the static planner
      // sort-merges two post-aggregate relations of unknown size
      .join(broadcast(d.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))),
        Seq("lang"))
      .select(col("lang"), col("n_total"), col("n_kept"), col("kept_id_sum"))
      .orderBy("lang")
  }

  val mixtureSampleSql: String = {
    // draw = hash60("mix" ␁ doc_id) / 2^60 — lockstep with
    // Sampling.weightedHashSample; rate operand order mirrors
    // temperatureSample token-for-token (all correctly-rounded IEEE ops)
    val draw = s"CAST(${duckHash60("mix", "doc_id")} AS DOUBLE) / 1152921504606846976"
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |r AS (
       |  SELECT lang, n,
       |    least(1.0, 0.55 * sqrt(CAST((SELECT max(n) FROM c) AS DOUBLE)
       |                           / CAST(n AS DOUBLE))) AS rate
       |  FROM c),
       |kept AS (
       |  SELECT d.doc_id, d.lang
       |  FROM documents d JOIN r USING (lang)
       |  WHERE $draw < r.rate OR r.rate >= 1.0)
       |SELECT k.lang, r.n AS n_total, count(*) AS n_kept,
       |  CAST(sum(k.doc_id) AS BIGINT) AS kept_id_sum
       |FROM kept k JOIN r USING (lang)
       |GROUP BY k.lang, r.n ORDER BY k.lang""".stripMargin
  }

  /** q95: exact-size deterministic sample ([[Sampling.exactKSample]])
    * — the 20 smallest-hash docs per language, ranked, via the bounded
    * [[graft.operators.TopKAgg]] (O(strata×k) shuffle bytes, no window
    * sort). The oracle replays the rank with a row_number window over
    * the SAME rounded-double hash order the aggregate uses.
    */
  def exactKSampleDocs(s: SparkSession, dir: String): DataFrame =
    Sampling.exactKSample(t(s, dir, "documents"), "lang", "doc_id",
        k = 20, salt = "evalk")
      .orderBy("lang", "sample_rank")

  val exactKSampleSql: String = {
    val hv = s"CAST(${duckHash60("evalk", "doc_id")} AS DOUBLE)"
    s"""WITH r AS (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY $hv ASC, doc_id ASC) AS sample_rank
       |  FROM documents)
       |SELECT lang, CAST(sample_rank AS INT) AS sample_rank, doc_id
       |FROM r WHERE sample_rank <= 20 ORDER BY lang, sample_rank""".stripMargin
  }

  /** Token-budget packing ([[CorpusPrep.packByBudget]]): per language,
    * admit documents in (quality DESC, doc_id ASC) order while the
    * running token total stays ≤ 2000 — the "fill the training mix to N
    * tokens" step. One window pass; the oracle replays the same
    * inclusive prefix-sum cut over the shared q21 quality fragments.
    */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    CorpusPrep.packByBudget(d, "lang", "quality", "doc_id", "n_tokens", 2000L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_packed"))
      .orderBy("lang")
  }

  val tokenBudgetSql: String =
    s"""WITH tok AS (SELECT doc_id, lang, text, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |m AS (
       |  SELECT doc_id, lang, text, toks, len(toks) AS n_tokens,
       |    $punctStopSqlExprs
       |  FROM tok),
       |q AS (
       |  SELECT doc_id, lang, n_tokens,
       |    $qualitySqlExpr AS quality
       |  FROM m),
       |p AS (
       |  SELECT *, SUM(n_tokens) OVER (
       |      PARTITION BY lang ORDER BY quality DESC, doc_id ASC
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM q)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_packed
       |FROM p WHERE cum <= 2000 GROUP BY lang ORDER BY lang""".stripMargin

  /** q90: q60's token-budget packing with the REAL trained BPE subword
    * tokenizer ([[graft.functions.Bpe]]) supplying the budget math —
    * token totals now match what a subword-tokenized LLM would see, not
    * the whitespace-word estimate. The Spark side encodes every doc for
    * real (greedy merges over the committed fixtures/bpe_merges table);
    * DuckDB cannot replay an iterative merge loop, so the oracle joins
    * exploded words against the committed word→n_bpe vocabulary table
    * ([[graft.tools.BpeTrain]] — closed over the testdata by
    * construction; an OOV word would surface as a hash mismatch, the
    * pin failing loudly). Budget 4000: subword counts run ~2× word
    * counts on this corpus, keeping the packing selective.
    */
  def bpeBudget(s: SparkSession, dir: String): DataFrame = {
    val bpe = graft.functions.Bpe.load(s, "/root/repo/fixtures/bpe_merges.parquet")
    val cnt = graft.functions.Bpe.countUdf(bpe)
    val d = t(s, dir, "documents").where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        cnt(col("text")).as("n_tokens"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    CorpusPrep.packByBudget(d, "lang", "quality", "doc_id", "n_tokens", 4000L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_packed"))
      .orderBy("lang")
  }

  val bpeBudgetSql: String =
    s"""WITH tok AS (SELECT doc_id, lang, text, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |bp AS (SELECT word, n_bpe FROM read_parquet(
       |        '/root/repo/fixtures/bpe_words.parquet/*.parquet')),
       |w AS (SELECT doc_id, unnest(toks) AS word FROM tok),
       |cnt AS (SELECT w.doc_id, SUM(bp.n_bpe) AS n_bpe
       |        FROM w JOIN bp ON bp.word = w.word GROUP BY w.doc_id),
       |m AS (
       |  SELECT doc_id, lang, text, toks, len(toks) AS n_tokens,
       |    $punctStopSqlExprs
       |  FROM tok),
       |q AS (
       |  SELECT doc_id, lang,
       |    $qualitySqlExpr AS quality
       |  FROM m),
       |p AS (
       |  SELECT q.doc_id, q.lang, q.quality,
       |    COALESCE(cnt.n_bpe, 0) AS n_bpe,
       |    SUM(COALESCE(cnt.n_bpe, 0)) OVER (
       |      PARTITION BY q.lang ORDER BY q.quality DESC, q.doc_id ASC
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM q LEFT JOIN cnt ON cnt.doc_id = q.doc_id)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_bpe) AS BIGINT) AS tokens_packed
       |FROM p WHERE cum <= 4000 GROUP BY lang ORDER BY lang""".stripMargin

  /** q96: sequence packing ([[CorpusPrep.packSequences]]) — documents
    * laid end-to-end per language in doc_id order, measured in REAL
    * trained-BPE tokens (q90's committed vocab), cut into ctx=2048
    * examples. All-integer output: the per-example doc counts, token
    * counts and first/last doc pin the entire packed layout, which the
    * oracle replays from the same prefix-sum arithmetic over the
    * committed word-table token counts.
    */
  def packExamples(s: SparkSession, dir: String): DataFrame = {
    val bpe = graft.functions.Bpe.load(s, "/root/repo/fixtures/bpe_merges.parquet")
    val cnt = graft.functions.Bpe.countUdf(bpe)
    val d = t(s, dir, "documents").where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), cnt(col("text")).as("n_bpe"))
    CorpusPrep.packSequences(d, "lang", "doc_id", "n_bpe", ctxLen = 2048L)
      .orderBy("lang", "example_id")
  }

  val packExamplesSql: String =
    s"""WITH tok AS (SELECT doc_id, lang, $duckToks AS toks
       |            FROM documents WHERE text IS NOT NULL),
       |bp AS (SELECT word, n_bpe FROM read_parquet(
       |        '/root/repo/fixtures/bpe_words.parquet/*.parquet')),
       |w AS (SELECT doc_id, unnest(toks) AS word FROM tok),
       |cnt AS (SELECT w.doc_id, SUM(bp.n_bpe) AS n_bpe
       |        FROM w JOIN bp ON bp.word = w.word GROUP BY w.doc_id),
       |d AS (SELECT t.doc_id, t.lang, CAST(COALESCE(cnt.n_bpe, 0) AS BIGINT) AS n
       |      FROM tok t LEFT JOIN cnt ON cnt.doc_id = t.doc_id),
       |o AS (
       |  SELECT doc_id, lang, n,
       |    CAST(COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
       |  FROM d WHERE n > 0),
       |sp AS (
       |  SELECT lang, doc_id, n, s, s + n AS e,
       |    unnest(range(s // 2048, (s + n - 1) // 2048 + 1)) AS example_id
       |  FROM o)
       |SELECT lang, example_id, count(*) AS n_docs,
       |  CAST(SUM(least(e, (example_id + 1) * 2048) -
       |           greatest(s, example_id * 2048)) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM sp GROUP BY lang, example_id ORDER BY lang, example_id""".stripMargin

  /** q97: integer-scaled PageRank ([[graft.operators.Graph.pageRank]],
    * 10 iterations, damping 85%) over the undirected customer↔part
    * graph from orders×lineitem (part ids offset by 10M into the shared
    * id space) — entity-importance centrality, the graph-analytics
    * sibling of q35's connected components. All-integer ranks, so the
    * oracle replays every iteration exactly as ten unrolled CTEs of the
    * same floor-division arithmetic. Top 25 by (rank DESC, id ASC).
    */
  def pageRankParts(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    // orders is the thin side (2 columns) — broadcast keeps lineitem,
    // the fact table, un-shuffled in the edge derivation
    val fwd = l.join(broadcast(o), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.pageRank(edges, iterations = 10)
      .orderBy(col("rank").desc, col("id").asc).limit(25)
  }

  val pageRankSql: String = {
    // ten unrolled iterations of the SAME scaled-integer arithmetic —
    // r0 = 1e12 per node; r_{i+1} = 15e10 + (85 · Σ inflow(rank div
    // outdeg)) // 100. Unrolled because recursive CTEs cannot aggregate
    // over the recursive table; the fixed iteration count makes the
    // expansion exact, not approximate.
    val iters = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT n.id,
         |    150000000000 + (85 * COALESCE(inf.s, 0)) // 100 AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(r.rank // deg.d) AS BIGINT) AS s
         |    FROM r${i - 1} r JOIN e ON e.src = r.id
         |    JOIN deg ON deg.src = r.id
         |    GROUP BY e.dst) inf USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH fwd AS (
       |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
       |    CAST(l.l_partkey + 10000000 AS BIGINT) AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |e AS (SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd),
       |nodes AS (SELECT DISTINCT src AS id FROM e),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS rank FROM nodes),
       |$iters
       |SELECT id, rank FROM r10 ORDER BY rank DESC, id ASC LIMIT 25""".stripMargin
  }

  /** q92: equi-depth quantile binning ([[Stats.equiDepthBins]]) — every
    * event's value assigned its within-type quartile bucket. The
    * boundaries are `percentile_disc` data values (no interpolation
    * arithmetic to diverge on), and the oracle replays the SQL-standard
    * definition literally: boundary = min value with cume_dist ≥
    * b/nBins, bucket = count of boundaries strictly below the value.
    */
  def quantileBins(s: SparkSession, dir: String): DataFrame =
    Stats.equiDepthBins(
        t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"), "value", nBins = 4)
      .orderBy("event_id")

  val quantileBinsSql: String =
    """WITH t AS (SELECT event_id, event_type, value FROM events),
      |cd AS (
      |  SELECT event_type, value,
      |    CUME_DIST() OVER (PARTITION BY event_type ORDER BY value) AS c
      |  FROM t WHERE value IS NOT NULL),
      |bnd AS (
      |  SELECT event_type, b, MIN(value) AS vb
      |  FROM cd CROSS JOIN (VALUES (1), (2), (3)) bs(b)
      |  WHERE c >= CAST(b AS DOUBLE) / 4
      |  GROUP BY event_type, b),
      |piv AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN b = 1 THEN vb END) AS q1,
      |    MAX(CASE WHEN b = 2 THEN vb END) AS q2,
      |    MAX(CASE WHEN b = 3 THEN vb END) AS q3
      |  FROM bnd GROUP BY event_type)
      |SELECT t.event_id, t.event_type, t.value,
      |  CASE WHEN t.value IS NULL OR q1 IS NULL THEN NULL ELSE
      |    (CASE WHEN t.value > q1 THEN 1 ELSE 0 END +
      |     CASE WHEN t.value > q2 THEN 1 ELSE 0 END +
      |     CASE WHEN t.value > q3 THEN 1 ELSE 0 END) END AS bin
      |FROM t LEFT JOIN piv ON t.event_type IS NOT DISTINCT FROM piv.event_type
      |ORDER BY event_id""".stripMargin

  /** Map-typed columns: build a map from event fields, explode its
    * entries, aggregate per key — the map-column shape (creation +
    * entry explode) that JSON extraction (q07) does not cover.
    */
  def mapExplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(explode(map(
        lit("type"), col("event_type"),
        lit("uid_bucket"), (col("user_id") % 100).cast("string")))
        .as(Seq("key", "value")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("value")).as("n_values"))
      .orderBy("key")

  // melted form, then GROUP BY: on an EMPTY events table this yields
  // zero rows like Spark's groupBy-after-explode (two ungrouped
  // aggregate branches would emit two zero-count rows instead)
  val mapExplodeSql: String =
    """SELECT key, COUNT(*) AS cnt, COUNT(DISTINCT value) AS n_values FROM (
      |  SELECT 'type' AS key, event_type AS value FROM events
      |  UNION ALL
      |  SELECT 'uid_bucket', CAST(user_id % 100 AS VARCHAR) FROM events)
      |GROUP BY key ORDER BY key""".stripMargin
}
